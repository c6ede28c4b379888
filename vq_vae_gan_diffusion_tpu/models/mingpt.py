"""minGPT-style causal transformer, TPU-native.

Structural parity with reference ``network/vqTransformer/submodule/mingpt.py``:
learned positional embedding [1, block_size, n_embd] (:128), pre-LN blocks with
single-hidden-layer GELU MLPs (:87-113), separate q/k/v projections with bias
and a bias-free vocab head (:42-48, :137), N(0, 0.02) weight init (:143-150).

TPU re-design: the reference samples autoregressively by re-running the full
forward on a growing prefix — O(T²·layers) with a host-side Python loop
(vqTransformer.py:173-216, flagged as hot loop ② in SURVEY §3). Here decoding
is a ``jax.lax.scan`` over a preallocated KV cache: one compiled program, one
device-resident loop, O(T) per token.

Tensor-parallel ready: q/k/v and MLP fc1 kernels are column-sharded and
proj/fc2 row-sharded over the 'model' mesh axis by
:func:`..parallel.gpt_param_sharding_rules`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_DENSE_INIT = nn.initializers.normal(stddev=0.02)


class CausalSelfAttention(nn.Module):
    n_head: int
    n_embd: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        dense = lambda name: nn.Dense(self.n_embd, kernel_init=_DENSE_INIT,
                                      dtype=self.dtype, param_dtype=jnp.float32,
                                      name=name)
        self.query, self.key, self.value = dense("query"), dense("key"), dense("value")
        self.proj = dense("proj")
        self.attn_drop = nn.Dropout(self.attn_pdrop)
        self.resid_drop = nn.Dropout(self.resid_pdrop)

    def _heads(self, x: jax.Array) -> jax.Array:
        b, t, c = x.shape
        return x.reshape(b, t, self.n_head, c // self.n_head)

    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        b, t, c = x.shape
        q = self._heads(self.query(x))
        k = self._heads(self.key(x))
        v = self._heads(self.value(x))
        scale = (c // self.n_head) ** -0.5
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * scale
        mask = jnp.tril(jnp.ones((t, t), bool))
        att = jnp.where(mask, att, -jnp.inf)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        att = self.attn_drop(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, c)
        return self.resid_drop(self.proj(y), deterministic=deterministic)

    def decode_step(self, x: jax.Array, pos: jax.Array,
                    cache: Dict[str, jax.Array]) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """One-token attention against a [B, block, H, D] KV cache."""
        b, one, c = x.shape
        q = self._heads(self.query(x))[:, 0]          # [B, H, D]
        k_new = self._heads(self.key(x))[:, 0]
        v_new = self._heads(self.value(x))[:, 0]
        k_cache = jax.lax.dynamic_update_index_in_dim(cache["k"], k_new, pos, axis=1)
        v_cache = jax.lax.dynamic_update_index_in_dim(cache["v"], v_new, pos, axis=1)
        scale = (c // self.n_head) ** -0.5
        att = jnp.einsum("bhd,bkhd->bhk", q, k_cache,
                         preferred_element_type=jnp.float32) * scale
        block = k_cache.shape[1]
        valid = jnp.arange(block)[None, None, :] <= pos
        att = jnp.where(valid, att, -jnp.inf)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhk,bkhd->bhd", att, v_cache).reshape(b, 1, c)
        return self.proj(y), {"k": k_cache, "v": v_cache}


class Block(nn.Module):
    n_head: int
    n_embd: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        self.ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        self.attn = CausalSelfAttention(self.n_head, self.n_embd, self.attn_pdrop,
                                        self.resid_pdrop, self.dtype)
        self.fc1 = nn.Dense(4 * self.n_embd, kernel_init=_DENSE_INIT,
                            dtype=self.dtype, param_dtype=jnp.float32, name="fc1")
        self.fc2 = nn.Dense(self.n_embd, kernel_init=_DENSE_INIT,
                            dtype=self.dtype, param_dtype=jnp.float32, name="fc2")
        self.drop = nn.Dropout(self.resid_pdrop)

    def _mlp(self, x: jax.Array, deterministic: bool) -> jax.Array:
        # exact-erf GELU to match torch nn.GELU (mingpt.py:100)
        h = nn.gelu(self.fc1(x), approximate=False)
        return self.drop(self.fc2(h), deterministic=deterministic)

    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = x + self.attn(self.ln1(x), deterministic=deterministic)
        x = x + self._mlp(self.ln2(x), deterministic)
        return x

    def decode_step(self, x, pos, cache):
        attn, cache = self.attn.decode_step(self.ln1(x), pos, cache)
        x = x + attn
        x = x + self._mlp(self.ln2(x), True)
        return x, cache


class GPT(nn.Module):
    vocab_size: int = 1024
    block_size: int = 512
    n_layer: int = 12
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    dtype: Dtype = jnp.float32
    # rematerialize each block's activations in backward (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(n_layer) less activation HBM —
    # the knob that lets >1B-param priors train under FSDP without OOM
    remat: bool = False
    # sequence parallelism (Megatron-SP style): a NamedSharding applied to
    # the [B, T, C] activations entering every block, e.g.
    # NamedSharding(mesh, P('data', 'model', None)) — the token axis lives
    # sharded over 'model' through the LN/residual regions and GSPMD inserts
    # the all-gather/reduce-scatter pairs around attention. Cuts the
    # replicated-activation footprint 1/|model| for long sequences; exact
    # numerics (tests/test_pipeline_sp.py)
    act_sharding: Optional[Any] = None

    def setup(self):
        self.tok_emb = nn.Embed(self.vocab_size, self.n_embd,
                                embedding_init=_DENSE_INIT,
                                param_dtype=jnp.float32, dtype=self.dtype)
        self.pos_emb = self.param("pos_emb", nn.initializers.zeros,
                                  (1, self.block_size, self.n_embd))
        self.drop = nn.Dropout(self.embd_pdrop)
        self.blocks = [Block(self.n_head, self.n_embd, self.attn_pdrop,
                             self.resid_pdrop, self.dtype, name=f"block{i}")
                       for i in range(self.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        self.head = nn.Dense(self.vocab_size, use_bias=False, kernel_init=_DENSE_INIT,
                             dtype=self.dtype, param_dtype=jnp.float32, name="head")

    def __call__(self, idx: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """idx [B, T] int32 → logits [B, T, vocab]."""
        t = idx.shape[1]
        assert t <= self.block_size, "block size exhausted"
        x = self.tok_emb(idx) + self.pos_emb[:, :t, :].astype(self.dtype)
        x = self.drop(x, deterministic=deterministic)

        def run_block(block, y):
            return block(y, deterministic=deterministic)
        if self.remat:
            run_block = nn.remat(run_block)
        constrain = (
            (lambda y: jax.lax.with_sharding_constraint(y, self.act_sharding))
            if self.act_sharding is not None else (lambda y: y))
        x = constrain(x)
        for block in self.blocks:
            x = constrain(run_block(block, x))
        x = self.ln_f(x)
        return self.head(x)

    # -- KV-cache decoding -------------------------------------------------
    def init_cache(self, batch: int,
                   length: Optional[int] = None) -> Tuple[Dict[str, jax.Array], ...]:
        """KV cache sized to ``length`` (default block_size). Decode attends
        over the whole allocation every step, so sizing it to the actual
        sample length (not block_size) directly cuts cache bandwidth — the
        dominant cost of the decode loop at these model sizes."""
        head_dim = self.n_embd // self.n_head
        n = int(length or self.block_size)
        z = lambda: jnp.zeros((batch, n, self.n_head, head_dim), self.dtype)
        return tuple({"k": z(), "v": z()} for _ in range(self.n_layer))

    def decode_step(self, token: jax.Array, pos: jax.Array, cache):
        """token [B] int32, pos scalar → (logits [B, vocab], new cache)."""
        x = self.tok_emb(token[:, None])
        x = x + jax.lax.dynamic_slice_in_dim(self.pos_emb, pos, 1, axis=1).astype(self.dtype)
        new_cache = []
        for block, layer_cache in zip(self.blocks, cache):
            x, layer_cache = block.decode_step(x, pos, layer_cache)
            new_cache.append(layer_cache)
        x = self.ln_f(x)
        return self.head(x)[:, 0], tuple(new_cache)


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep top-k entries, set the rest to −inf (vqTransformer.py:156-170)."""
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_tokens(gpt: GPT, params, rng: jax.Array, prefix: jax.Array,
                  prefix_len: int, steps: int, temperature: float = 1.0,
                  top_k: Optional[int] = 100, fused: Optional[bool] = None,
                  quant: Optional[str] = None,
                  interpret: bool = False) -> jax.Array:
    """KV-cached autoregressive sampling as one ``lax.scan``.

    Args:
      prefix: [B, L0] given tokens (SOS + optional partial indices). L0 ≥ 1.
      prefix_len: static length of the given prefix.
      steps: number of tokens to generate.
      fused: route each token through a single-launch Pallas decode-stack
        kernel (ops/gpt_decode_pallas.py) instead of ~10 XLA ops per layer,
        whose ~3 µs/op fixed sequencing overhead dominates this op mix.
        Small models use the whole-layer-resident kernel (measured 1.47×
        on a v5e at the mnist prior's scale: 167 vs 245 µs/token at C=512,
        L=8, B=16); larger ones the VMEM-bounded chunked variant. Default
        (None) auto-enables on TPU for bf16 models with lane-aligned widths;
        numerics agree with the XLA path to bf16 tolerance
        (tests/test_gpt_decode_pallas.py).
      quant: ``'int8'`` streams the block weights as per-output-channel
        symmetric int8 through the chunked kernel (dequant in-body) — the
        decode step is weight-DMA bound, so halving the weight bytes is a
        direct speedup. ``'int8kv'`` additionally keeps the KV cache as
        per-row int8. ``'int4'``/``'int4kv'`` nibble-pack the weight stream
        (¼ the bf16 bytes) at a larger distribution shift. Opt-in: the
        sampling distribution shifts by the quantization error
        (~0.4%/channel at int8); embeddings, LN affines, biases and the LM
        head stay full precision. Only takes effect on the fused path
        (quant of the XLA decode path would still be op-bound).

    Returns [B, steps] sampled tokens. Replaces the reference's Python loop of
    full re-forwards (vqTransformer.py:173-216).
    """
    if quant not in (None, "int8", "int8kv", "int4", "int4kv"):
        raise ValueError(f"unsupported quant mode {quant!r}")
    if fused is None:
        # the chunked kernel's largest resident blocks are the [C, C] weight
        # chunk and the [B, 64, 2C] KV chunk (both double-buffered) plus
        # ~8 [B, C] f32 scratch rows — bounded for any model the whole-layer
        # variant can't hold, so auto-enable keys only on backend/dtype/shape
        fused = (jax.default_backend() == "tpu" and gpt.dtype == jnp.bfloat16
                 and gpt.n_embd % 128 == 0
                 and _chunked_footprint(gpt, prefix.shape[0]) < 26 * 2 ** 20)
    if fused:
        return _sample_tokens_fused(gpt, params, rng, prefix, prefix_len,
                                    steps, temperature, top_k, interpret,
                                    quant)
    b = prefix.shape[0]
    # cast the weights to the compute dtype ONCE, outside the scan: flax casts
    # per-use, so bf16 decoding against f32 master params would re-read (and
    # re-cast) the full f32 weight set on every one of the `steps` iterations —
    # the decode loop is weight-bandwidth bound, so that halves throughput
    if gpt.dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(gpt.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
    total = prefix_len + steps - 1  # positions processed through decode_step
    cache = gpt.apply({"params": params}, b, min(total, gpt.block_size),
                      method=GPT.init_cache)

    def body(carry, t):
        cache, token, rng = carry
        token_in = jnp.where(t < prefix_len, prefix[:, jnp.minimum(t, prefix_len - 1)], token)
        logits, cache = gpt.apply({"params": params}, token_in, t, cache,
                                  method=GPT.decode_step)
        logits = logits.astype(jnp.float32) / temperature
        if top_k is not None:
            logits = top_k_filter(logits, top_k)
        rng, sub = jax.random.split(rng)
        sampled = jax.random.categorical(sub, logits, axis=-1)
        return (cache, sampled, rng), sampled

    (_, _, _), out = jax.lax.scan(body, (cache, prefix[:, 0], rng),
                                  jnp.arange(total))
    # outputs at positions [prefix_len-1, total) are the generated tokens
    return jnp.swapaxes(out, 0, 1)[:, prefix_len - 1:]


def _whole_layer_footprint(gpt: "GPT", b: int, n: int) -> int:
    """Approx VMEM bytes for the whole-layer-resident kernel: per-layer
    weights (12C²) + KV block (B·N·2C), double-buffered, next to ~3·B·N·C
    bytes of f32 attention intermediates. Calibrated on a v5e: C=512/L=8/
    B=16/N=128 (24.1 MB) compiles and runs 1.47× faster than XLA; C=1024
    whole-layer blocks (96 MB) do not fit."""
    c = gpt.n_embd
    return 2 * 2 * (12 * c * c + b * n * 2 * c) + 3 * b * n * c


def _chunked_footprint(gpt: "GPT", b: int) -> int:
    """Approx VMEM bytes for the chunked kernel: one [C, C] attention chunk,
    one [C, 2C] MLP chunk and one [B, 64, 2C] KV chunk (each double-buffered)
    + ~10 [B, C] f32 scratch rows."""
    c = gpt.n_embd
    return 2 * 2 * (3 * c * c + b * 64 * 2 * c) + 10 * 4 * b * c


def _sample_tokens_fused(gpt: GPT, params, rng: jax.Array, prefix: jax.Array,
                         prefix_len: int, steps: int, temperature: float,
                         top_k: Optional[int], interpret: bool,
                         quant: Optional[str] = None) -> jax.Array:
    """Sampling scan whose per-token body is ONE Pallas kernel for the whole
    block stack plus a handful of XLA ops (embed, ln_f, head, sample) — see
    ops/gpt_decode_pallas.py for why this beats the op-per-layer XLA path."""
    from ..ops.gpt_decode_pallas import (
        fused_decode_stack, fused_decode_stack_chunked, pack_decode_params,
        pack_decode_params_chunked)

    b = prefix.shape[0]
    c = gpt.n_embd
    dtype = gpt.dtype
    total = min(prefix_len + steps - 1, gpt.block_size)
    # int8 weight streaming only exists in the chunked variant
    whole_layer = quant is None and _whole_layer_footprint(
        gpt, b, -(-total // 16) * 16) < 26 * 2 ** 20
    if whole_layer:
        packed = pack_decode_params(params, gpt.n_layer, dtype=dtype)
        n = -(-total // 16) * 16   # sublane-align the cache length
    else:
        packed = pack_decode_params_chunked(params, gpt.n_layer, dtype=dtype,
                                            quant=quant)
        n = -(-total // 64) * 64   # KV-chunk-align the cache length
    quantkv = quant in ("int8kv", "int4kv")   # KV rows are int8 either way
    tok_emb = params["tok_emb"]["embedding"].astype(jnp.float32)
    pos_emb = params["pos_emb"][0].astype(jnp.float32)
    lnf_s = params["ln_f"]["scale"].astype(jnp.float32)
    lnf_b = params["ln_f"]["bias"].astype(jnp.float32)
    w_head = params["head"]["kernel"].astype(dtype)

    kv = jnp.zeros((gpt.n_layer, b, n, 2 * c),
                   jnp.int8 if quantkv else dtype)
    # int8-KV mode: per-row f32 dequant scales, committed alongside the rows
    kv_sc = jnp.ones((gpt.n_layer, n, 2 * b), jnp.float32) if quantkv else None

    def body(carry, t):
        kv, kv_sc, token, rng = carry
        token_in = jnp.where(t < prefix_len,
                             prefix[:, jnp.minimum(t, prefix_len - 1)], token)
        x = tok_emb[token_in] + pos_emb[t]
        if whole_layer:
            h, news = fused_decode_stack(x, packed, kv, t, n_head=gpt.n_head,
                                         interpret=interpret)
        elif quantkv:
            h, news, sc_new = fused_decode_stack_chunked(
                x, packed, kv, t, n_head=gpt.n_head, kv_scales=kv_sc,
                compute_dtype=dtype, interpret=interpret)
            kv_sc = jax.lax.dynamic_update_slice(kv_sc, sc_new, (0, t, 0))
        else:
            h, news = fused_decode_stack_chunked(x, packed, kv, t,
                                                 n_head=gpt.n_head,
                                                 interpret=interpret)
        kv = jax.lax.dynamic_update_slice(kv, news[:, :, None, :], (0, 0, t, 0))
        mu = jnp.mean(h, -1, keepdims=True)
        xc = h - mu
        hn = (xc * jax.lax.rsqrt(jnp.mean(xc * xc, -1, keepdims=True) + 1e-5)
              * lnf_s + lnf_b)
        logits = jnp.dot(hn.astype(dtype), w_head,
                         preferred_element_type=jnp.float32) / temperature
        if top_k is not None:
            logits = top_k_filter(logits, top_k)
        rng, sub = jax.random.split(rng)
        sampled = jax.random.categorical(sub, logits, axis=-1)
        return (kv, kv_sc, sampled, rng), sampled

    # kv_sc is None (an empty pytree) outside int8kv mode — legal scan carry
    _, out = jax.lax.scan(body, (kv, kv_sc, prefix[:, 0], rng),
                          jnp.arange(total))
    return jnp.swapaxes(out, 0, 1)[:, prefix_len - 1:]
