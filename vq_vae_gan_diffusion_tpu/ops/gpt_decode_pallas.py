"""Fused Pallas TPU kernel for the GPT autoregressive decode step.

Why: decoding one token through the minGPT prior (reference
vqTransformer.py:173-216, rebuilt as a KV-cached ``lax.scan`` in
``models/mingpt.py``) issues ~10 small XLA ops per layer (LN, 3 GEMMs, cache
update, 2 attention einsums, softmax, proj, MLP). Measured on a v5e, each op
carries ~3 µs of fixed sequencing overhead, so a 12-layer step costs
~470 µs/token while its HBM traffic (weights ~19 MB + KV cache ~12 MB) only
justifies ~40 µs. XLA-level fusion (joint QKV GEMM, merged KV buffer) does not
recover this — the op count barely drops. This kernel runs the ENTIRE
12-layer stack in ONE kernel launch:

- grid = (n_layer,); per-layer weights are stacked [L, ...] and BlockSpec'd
  per grid step, so Mosaic double-buffers the weight DMA behind compute;
- the residual-stream activation x [B, C] lives in the output VMEM block
  (constant index map) and carries across grid steps;
- the KV cache [L, B, N, 2C] is a READ-ONLY blocked input. The current
  token's k/v contribution enters the softmax analytically (lazy-append:
  separate max/exp/denominator terms), and the kernel *returns* the new
  per-layer k/v rows [L, B, 2C]; the caller commits them with a single
  ``dynamic_update_slice`` — one XLA op per token for all layers, and no
  48 MB/token cache write-back through the kernel;
- attention never materializes a [B, N, H, D] relayout: with heads laid out
  as contiguous 32-lane groups of the C axis, the within-head reduction
  Σ_d q·k is an MXU matmul against a constant 0/1 segment matrix S [C, H],
  and the head→lane expansion of the softmax weights is S^T.

Numerics: LayerNorm, softmax statistics and the residual stream are f32;
GEMMs take the cache/param compute dtype (bf16 in production) with f32
accumulation; GELU is exact-erf to match torch nn.GELU (mingpt.py:100).

``reference_decode_stack`` is the plain-XLA executable spec (tests + CPU
fallback); ``tests/test_gpt_decode_pallas.py`` checks parity in interpret
mode against both the spec and ``GPT.decode_step``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Param packing: flax GPT tree -> stacked [L, ...] arrays
# ---------------------------------------------------------------------------

def pack_decode_params(params: Dict[str, Any], n_layer: int,
                       dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Stack per-block weights into [L, ...] arrays for the fused kernel.

    Query/key/value kernels are concatenated into one [C, 3C] GEMM. LayerNorm
    affines stay f32 (the kernel normalizes in f32); GEMM weights are cast to
    the compute ``dtype``.
    """
    def stack(path, cast):
        return jnp.stack([functools.reduce(lambda d, k: d[k],
                                           [f"block{i}"] + path, params)
                          for i in range(n_layer)]).astype(cast)

    wq = stack(["attn", "query", "kernel"], dtype)
    wk = stack(["attn", "key", "kernel"], dtype)
    wv = stack(["attn", "value", "kernel"], dtype)
    bq = stack(["attn", "query", "bias"], jnp.float32)
    bk = stack(["attn", "key", "bias"], jnp.float32)
    bv = stack(["attn", "value", "bias"], jnp.float32)
    l_ = n_layer
    c = wq.shape[1]
    return {
        "ln1_s": stack(["ln1", "scale"], jnp.float32).reshape(l_, 1, c),
        "ln1_b": stack(["ln1", "bias"], jnp.float32).reshape(l_, 1, c),
        "wqkv": jnp.concatenate([wq, wk, wv], axis=-1),            # [L, C, 3C]
        "bqkv": jnp.concatenate([bq, bk, bv], axis=-1).reshape(l_, 1, 3 * c),
        "wproj": stack(["attn", "proj", "kernel"], dtype),          # [L, C, C]
        "bproj": stack(["attn", "proj", "bias"], jnp.float32).reshape(l_, 1, c),
        "ln2_s": stack(["ln2", "scale"], jnp.float32).reshape(l_, 1, c),
        "ln2_b": stack(["ln2", "bias"], jnp.float32).reshape(l_, 1, c),
        "wfc1": stack(["fc1", "kernel"], dtype),                    # [L, C, 4C]
        "bfc1": stack(["fc1", "bias"], jnp.float32).reshape(l_, 1, 4 * c),
        "wfc2": stack(["fc2", "kernel"], dtype),                    # [L, 4C, C]
        "bfc2": stack(["fc2", "bias"], jnp.float32).reshape(l_, 1, c),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _erf(x: jax.Array) -> jax.Array:
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has
    no erf/erfc lowering, and exp it does have."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ln(x32: jax.Array, scale, bias, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * scale + bias


def _decode_stack_kernel(t_ref, x_in, ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                         ln2_s, ln2_b, wfc1, bfc1, wfc2, bfc2, kv,
                         x_out, kv_new, *, n_head: int, dtype):
    """One grid step = one transformer block applied to x (carried in x_out)."""
    t = t_ref[0]
    b, c = x_out.shape
    n = kv.shape[2]
    d = c // n_head
    scale = jnp.float32(d) ** -0.5

    # the residual stream lives in the x_out VMEM block (constant index map →
    # one buffer across all grid steps, written back to HBM once at the end);
    # seed it from the embedding input at the first layer
    @pl.when(pl.program_id(0) == 0)
    def _():
        x_out[:] = x_in[:]

    x = x_out[:]                                         # f32 residual stream

    # ---- attention ----
    xn = _ln(x, ln1_s[0], ln1_b[0]).astype(dtype)
    qkv = jnp.dot(xn, wqkv[0], preferred_element_type=jnp.float32) + bqkv[0]
    q = qkv[:, :c] * scale                               # [B, C] f32
    k_new = qkv[:, c:2 * c]                              # [B, C] f32
    v_new = qkv[:, 2 * c:]                               # [B, C] f32

    # head-segment matrix S[c, h] = 1 iff lane c belongs to head h
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (c, n_head), 1)
    seg = (lane // d == head).astype(dtype)              # [C, H]

    kc = kv[0, :, :, :c]                                 # [B, N, C] dtype
    vc = kv[0, :, :, c:]                                 # [B, N, C] dtype
    # att[b, n, h] = Σ_d q·k  — elementwise product then MXU segment-sum
    p = kc * q[:, None, :].astype(dtype)                 # [B, N, C]
    att = jax.lax.dot_general(
        p.reshape(b * n, c), seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(b, n, n_head)
    att_self = jnp.dot((k_new * q).astype(dtype), seg,
                       preferred_element_type=jnp.float32)          # [B, H]

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    valid = pos < t                                      # rows < t are history
    att = jnp.where(valid, att, -jnp.inf)
    m = jnp.maximum(jnp.max(att, axis=1), att_self)      # [B, H]
    e = jnp.where(valid, jnp.exp(att - m[:, None, :]), 0.0)
    es = jnp.exp(att_self - m)                           # [B, H]
    denom = jnp.sum(e, axis=1) + es                      # [B, H]

    segt = seg.T                                         # [H, C]
    aexp = jax.lax.dot_general(
        e.astype(dtype).reshape(b * n, n_head), segt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype).reshape(b, n, c)
    num = jnp.sum((aexp * vc).astype(jnp.float32), axis=1)          # [B, C]
    num = num + jnp.dot(es.astype(dtype), segt,
                        preferred_element_type=jnp.float32) * v_new
    den = jnp.dot(denom.astype(dtype), segt, preferred_element_type=jnp.float32)
    y = (num / den).astype(dtype)                        # [B, C]
    x = x + jnp.dot(y, wproj[0], preferred_element_type=jnp.float32) + bproj[0]

    # ---- MLP (exact-erf GELU, matching torch nn.GELU) ----
    hn = _ln(x, ln2_s[0], ln2_b[0]).astype(dtype)
    h = jnp.dot(hn, wfc1[0], preferred_element_type=jnp.float32) + bfc1[0]
    h = (0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))).astype(dtype)
    x = x + jnp.dot(h, wfc2[0], preferred_element_type=jnp.float32) + bfc2[0]

    x_out[:] = x
    kv_new[0] = jnp.concatenate([k_new, v_new], axis=-1).astype(kv_new.dtype)


def fused_decode_stack(x: jax.Array, packed: Dict[str, jax.Array],
                       kv_cache: jax.Array, t: jax.Array, *, n_head: int,
                       interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Run all transformer blocks for one decode position in one kernel.

    Args:
      x: [B, C] f32 — token embedding + positional embedding.
      packed: stacked weights from :func:`pack_decode_params`.
      kv_cache: [L, B, N, 2C] — K rows in [..., :C], V in [..., C:]; only
        rows < t are read. NOT updated here; the caller writes the returned
        rows at position t (one ``dynamic_update_slice`` for all layers).
      t: scalar int32 current position.

    Returns (x_out [B, C] f32 pre-ln_f hidden, kv_new [L, B, 2C]).
    """
    l, b, n, c2 = kv_cache.shape
    c = c2 // 2
    dtype = kv_cache.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((b, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 3 * c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 4 * c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, n, c2), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, c2), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(_decode_stack_kernel, n_head=n_head, dtype=dtype)
    x_out, kv_new = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, c), jnp.float32),
                   jax.ShapeDtypeStruct((l, b, c2), dtype)],
        interpret=interpret,
    )(jnp.asarray([t], jnp.int32), x.astype(jnp.float32),
      packed["ln1_s"], packed["ln1_b"], packed["wqkv"], packed["bqkv"],
      packed["wproj"], packed["bproj"], packed["ln2_s"], packed["ln2_b"],
      packed["wfc1"], packed["bfc1"], packed["wfc2"], packed["bfc2"], kv_cache)
    return x_out, kv_new


# ---------------------------------------------------------------------------
# Chunked variant: VMEM-bounded sub-layer blocking for large models
# ---------------------------------------------------------------------------
#
# The whole-layer kernel above needs 12C² weights resident per grid step —
# 25 MB at C=1024, over VMEM. This variant re-blocks the SAME math on a
# (n_layer, S) grid where every sub-step touches at most one [C, C] weight
# chunk (2 MB bf16) and one [B, Nb, 2C] KV chunk:
#
#   j = 0..2            wq / wk / wv chunks → q, k_new, v_new; in the same
#                       steps, flash-style online-softmax accumulation over
#                       KV chunks 0..2
#   j = 3..KVS-1        remaining KV chunks (weight stream idles: the index
#                       map repeats, so Mosaic skips the DMA)
#   j = KVS             wproj: fold in the current token's (k,v) analytically,
#                       finalize y = num/denom, x += y @ wproj
#   j = KVS+1..KVS+4    MLP: fc1 half a → gelu, then fc2 half a (transposed
#                       [C, 2C] chunks in a second weight stream — larger
#                       chunks here halve the sub-step count, and grid-step
#                       sequencing overhead is ~30% of the kernel)
#
# The KV index map clamps to the last chunk containing history (< t), so a
# token at position t only reads ceil(t/Nb) chunks — average KV traffic is
# halved vs. the full-cache reads of both the XLA path and the whole-layer
# kernel. Online-softmax state (m, denom, num) lives in VMEM scratch across
# sub-steps, like the residual stream x.

_NB = 64           # KV rows per chunk (sublane-aligned for bf16)
_NG = 8            # int4 contraction groups per chunk (group size = R/8)


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """Pack int4 values (float in [-7, 7]) pairwise along axis -2: byte row r
    holds original row r in its low nibble and row r + R/2 in its high one."""
    q = q.astype(jnp.int32)
    r = q.shape[-2]
    lo = jax.lax.slice_in_dim(q, 0, r // 2, axis=-2)
    hi = jax.lax.slice_in_dim(q, r // 2, r, axis=-2)
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)


def _unpack_nibbles(w8: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """Inverse of :func:`_pack_nibbles` for one [R/2, O] block: returns the
    (rows [0, R/2), rows [R/2, R)) halves as ``dtype``. Sign-extension uses
    mask arithmetic, not shift wraparound (`(v & 15) - ((v & 8) << 1)`),
    which lowers cleanly on both Mosaic and the interpreter."""
    w32 = w8.astype(jnp.int32)                    # sign-extends the byte
    lo = (w32 & 15) - ((w32 & 8) << 1)
    hi = w32 >> 4                                 # arithmetic shift
    return lo.astype(dtype), hi.astype(dtype)


def pack_decode_params_chunked(params: Dict[str, Any], n_layer: int,
                               dtype=jnp.bfloat16,
                               quant: str | None = None) -> Dict[str, jax.Array]:
    """Pack block weights as two uniform chunk streams.

    ``wattn`` [L, 4, C, C]: wq, wk, wv, wproj (fetched at j = 0, 1, 2, KVS).
    ``wmlp`` [L, 4, C, 2C]: fc1 column-half 0, fc2 row-half 0 (transposed),
    fc1 column-half 1, fc2 row-half 1 (transposed) — the fc2 halves are
    stored [C, 2C] and contracted on their second axis. Biases/LN affines
    stay f32; qkv biases are packed [L, 3, C] (row = j), fc1 biases
    [L, 2, 2C] (row = MLP half).

    ``quant='int8'`` stores the weight chunks as symmetric per-output-channel
    int8 (scale = max|w|/127 over the contracted axis) plus f32 scale rows
    ``sattn`` [L, 4, 1, C] / ``smlp`` [L, 4, 1, 2C] (fc2ᵀ chunks contract on
    their lane axis, so their per-row scales occupy lanes [:C]). The kernel
    converts int8→``dtype`` in-body and multiplies the f32 GEMM *output* by
    the scale row — mathematically per-channel dequantization, but the HBM
    weight stream (what the decode step is bound on) is halved vs bf16.

    ``quant='int4'`` additionally packs two int4 values ([-7, 7]) into each
    int8 byte along **axis 2** of the chunk: byte row r holds rows r (low
    nibble) and r + R/2 (high nibble) of the original [R, O] chunk, so
    ``wattn`` becomes [L, 4, C/2, C] and ``wmlp`` [L, 4, C/2, 2C]. Pairing
    halves (not adjacent rows) lets the kernel's GEMM split into
    *contiguous* slices — no strided slicing, which Mosaic cannot lower.
    int4 scales are **group-wise** (per-channel int4 is too coarse: ~17%
    quasi-greedy token agreement vs 92% for int8 on the unit-test model):
    the contraction axis is split into ``_NG`` = 8 equal groups, each with
    its own per-output-channel scale (= max|w|/7 over the group), stored as
    ``sattn`` [L, 4, 8, C] / ``smlp`` [L, 4, 8, 2C]. The kernel runs one
    [B, R/8] × [R/8, O] MXU pass per group and scales each partial f32
    output before accumulating — all on VMEM-resident data, while the HBM
    weight stream (the decode step's binding resource) is ¼ the bf16 bytes.
    For contraction-axis-2 chunks (wq/wk/wv/wproj, fc1) groups 0..3 live in
    the low-nibble half and 4..7 in the high one; fc2ᵀ chunks contract on
    their *lane* axis, so groups are lane slices and the per-(row, group)
    scales are stored transposed with outputs in lanes [:C] (ones padding,
    as in int8's fc2ᵀ rows).
    """
    def get(i, *path):
        return functools.reduce(lambda d, k: d[k], path, params[f"block{i}"])

    attn, mlp, bqkv = [], [], []
    for i in range(n_layer):
        wq = get(i, "attn", "query", "kernel")
        c = wq.shape[0]
        attn.append(jnp.stack([wq, get(i, "attn", "key", "kernel"),
                               get(i, "attn", "value", "kernel"),
                               get(i, "attn", "proj", "kernel")]))
        wfc1, wfc2 = get(i, "fc1", "kernel"), get(i, "fc2", "kernel")
        mlp.append(jnp.stack([wfc1[:, :2 * c], wfc2[:2 * c, :].T,
                              wfc1[:, 2 * c:], wfc2[2 * c:, :].T]))
        bqkv.append(jnp.stack([get(i, "attn", "query", "bias"),
                               get(i, "attn", "key", "bias"),
                               get(i, "attn", "value", "bias")]))

    def stack(path, cast):
        return jnp.stack([get(i, *path) for i in range(n_layer)]).astype(cast)

    l_, c = n_layer, attn[0].shape[-1]
    wattn = jnp.stack(attn)                                     # [L, 4, C, C]
    wmlp = jnp.stack(mlp)                                       # [L, 4, C, 2C]
    extra: Dict[str, jax.Array] = {}
    eps = 1e-8
    if quant in ("int8", "int8kv"):   # *kv quantizes the same weights; the
        # KV-cache quantization itself happens in-kernel (see
        # fused_decode_stack_chunked's kv_scales)
        wattn = wattn.astype(jnp.float32)
        wmlp = wmlp.astype(jnp.float32)
        # attn chunks all contract on axis 2 → per-output-column scales
        sattn = jnp.maximum(jnp.max(jnp.abs(wattn), axis=2, keepdims=True),
                            eps) / 127.0                        # [L, 4, 1, C]
        wattn = jnp.clip(jnp.round(wattn / sattn), -127, 127).astype(jnp.int8)
        wq_l, s_l = [], []
        for ci in range(4):
            w = wmlp[:, ci]                                     # [L, C, 2C]
            if ci % 2 == 0:   # fc1 halves: contract axis 1 → per-column
                s = jnp.maximum(jnp.max(jnp.abs(w), axis=1, keepdims=True),
                                eps) / 127.0                    # [L, 1, 2C]
                div, srow = s, s
            else:             # fc2ᵀ halves: contract axis 2 → per-row
                sr = jnp.maximum(jnp.max(jnp.abs(w), axis=2, keepdims=True),
                                 eps) / 127.0                   # [L, C, 1]
                div = sr
                srow = jnp.concatenate([jnp.swapaxes(sr, 1, 2),
                                        jnp.ones((l_, 1, c))], axis=2)
            wq_l.append(jnp.clip(jnp.round(w / div), -127, 127)
                        .astype(jnp.int8))
            s_l.append(srow)
        wmlp = jnp.stack(wq_l, axis=1)                          # int8
        extra = {"sattn": sattn.astype(jnp.float32),
                 "smlp": jnp.stack(s_l, axis=1).astype(jnp.float32)}
    elif quant in ("int4", "int4kv"):
        wattn = wattn.astype(jnp.float32)
        wmlp = wmlp.astype(jnp.float32)
        if c % (2 * _NG):
            raise ValueError(f"int4 needs n_embd % {2 * _NG} == 0, got {c}")
        # attn: contraction axis 2 in _NG groups → per-(group, column) scales
        wg = wattn.reshape(l_, 4, _NG, c // _NG, c)
        sattn = jnp.maximum(jnp.max(jnp.abs(wg), axis=3, keepdims=True),
                            eps) / 7.0                     # [L, 4, NG, 1, C]
        qa = jnp.clip(jnp.round(wg / sattn), -7, 7).reshape(l_, 4, c, c)
        wattn = _pack_nibbles(qa)                          # [L, 4, C/2, C]
        wq_l, s_l = [], []
        for ci in range(4):
            w = wmlp[:, ci]                                # [L, C, 2C]
            if ci % 2 == 0:   # fc1 halves: contract axis 1, grouped rows
                wg = w.reshape(l_, _NG, c // _NG, 2 * c)
                s = jnp.maximum(jnp.max(jnp.abs(wg), axis=2, keepdims=True),
                                eps) / 7.0                 # [L, NG, 1, 2C]
                q = jnp.clip(jnp.round(wg / s), -7, 7).reshape(l_, c, 2 * c)
                srow = s[:, :, 0, :]                       # [L, NG, 2C]
            else:             # fc2ᵀ halves: contract axis 2, grouped lanes
                wg = w.reshape(l_, c, _NG, 2 * c // _NG)
                sr = jnp.maximum(jnp.max(jnp.abs(wg), axis=3, keepdims=True),
                                 eps) / 7.0                # [L, C, NG, 1]
                q = jnp.clip(jnp.round(wg / sr), -7, 7).reshape(l_, c, 2 * c)
                # per-(output-row, group) scales → [L, NG, C] in lanes [:C]
                srow = jnp.concatenate(
                    [jnp.transpose(sr[:, :, :, 0], (0, 2, 1)),
                     jnp.ones((l_, _NG, c))], axis=2)      # [L, NG, 2C]
            wq_l.append(q)
            s_l.append(srow)
        wmlp = _pack_nibbles(jnp.stack(wq_l, axis=1))      # [L, 4, C/2, 2C]
        extra = {"sattn": sattn[:, :, :, 0, :].astype(jnp.float32),
                 "smlp": jnp.stack(s_l, axis=1).astype(jnp.float32)}
    elif quant is not None:
        raise ValueError(f"unsupported quant mode {quant!r}")
    else:
        wattn = wattn.astype(dtype)
        wmlp = wmlp.astype(dtype)
    return {
        "wattn": wattn,                                         # [L, 4, C, C]
        "wmlp": wmlp,                                           # [L, 4, C, 2C]
        **extra,
        "bqkv": jnp.stack(bqkv).astype(jnp.float32),            # [L, 3, C]
        "ln1_s": stack(["ln1", "scale"], jnp.float32).reshape(l_, 1, c),
        "ln1_b": stack(["ln1", "bias"], jnp.float32).reshape(l_, 1, c),
        "bproj": stack(["attn", "proj", "bias"], jnp.float32).reshape(l_, 1, c),
        "ln2_s": stack(["ln2", "scale"], jnp.float32).reshape(l_, 1, c),
        "ln2_b": stack(["ln2", "bias"], jnp.float32).reshape(l_, 1, c),
        "bfc1": stack(["fc1", "bias"],
                      jnp.float32).reshape(l_, 2, 2 * c),
        "bfc2": stack(["fc2", "bias"], jnp.float32).reshape(l_, 1, c),
    }


def _chunked_kernel(t_ref, x_in, wattn, wmlp, bqkv, ln1_s, ln1_b, bproj, ln2_s,
                    ln2_b, bfc1, bfc2, kv, x_out, kv_new,
                    xn_s, q_s, k_s, v_s, m_s, den_s, num_s, hn_s, h_s,
                    *, n_head: int, dtype, kc: int, kvs: int,
                    int4: bool = False):
    _chunked_body(t_ref, x_in, wattn, wmlp, None, None, bqkv, ln1_s, ln1_b,
                  bproj, ln2_s, ln2_b, bfc1, bfc2, kv, None, x_out, kv_new,
                  None, xn_s, q_s, k_s, v_s, m_s, den_s, num_s, hn_s, h_s,
                  n_head=n_head, dtype=dtype, kc=kc, kvs=kvs, int4=int4)


def _chunked_kernel_q(t_ref, x_in, wattn, wmlp, sattn, smlp, bqkv, ln1_s,
                      ln1_b, bproj, ln2_s, ln2_b, bfc1, bfc2, kv, x_out,
                      kv_new, xn_s, q_s, k_s, v_s, m_s, den_s, num_s, hn_s,
                      h_s, *, n_head: int, dtype, kc: int, kvs: int,
                      int4: bool = False):
    _chunked_body(t_ref, x_in, wattn, wmlp, sattn, smlp, bqkv, ln1_s, ln1_b,
                  bproj, ln2_s, ln2_b, bfc1, bfc2, kv, None, x_out, kv_new,
                  None, xn_s, q_s, k_s, v_s, m_s, den_s, num_s, hn_s, h_s,
                  n_head=n_head, dtype=dtype, kc=kc, kvs=kvs, int4=int4)


def _chunked_kernel_qkv(t_ref, x_in, wattn, wmlp, sattn, smlp, bqkv, ln1_s,
                        ln1_b, bproj, ln2_s, ln2_b, bfc1, bfc2, kv, kv_sc,
                        x_out, kv_new, sc_new, xn_s, q_s, k_s, v_s, m_s,
                        den_s, num_s, hn_s, h_s,
                        *, n_head: int, dtype, kc: int, kvs: int,
                        int4: bool = False):
    _chunked_body(t_ref, x_in, wattn, wmlp, sattn, smlp, bqkv, ln1_s, ln1_b,
                  bproj, ln2_s, ln2_b, bfc1, bfc2, kv, kv_sc, x_out, kv_new,
                  sc_new, xn_s, q_s, k_s, v_s, m_s, den_s, num_s, hn_s, h_s,
                  n_head=n_head, dtype=dtype, kc=kc, kvs=kvs, int4=int4)


def _chunked_body(t_ref, x_in, wattn, wmlp, sattn, smlp, bqkv, ln1_s, ln1_b,
                  bproj, ln2_s, ln2_b, bfc1, bfc2, kv, kv_sc, x_out, kv_new,
                  sc_new, xn_s, q_s, k_s, v_s, m_s, den_s, num_s, hn_s, h_s,
                  *, n_head: int, dtype, kc: int, kvs: int, int4: bool):
    quant = sattn is not None        # static: int8/int4 chunks + scale rows
    quantkv = kv_sc is not None      # static: int8 KV rows + per-row scales
    cw = x_out.shape[1]              # model width C (for nibble-half splits)

    def wa():                        # current attention weight chunk, as dtype
        return wattn[0, 0].astype(dtype) if quant else wattn[0, 0]

    def wm():                        # current MLP weight chunk, as dtype
        return wmlp[0, 0].astype(dtype) if quant else wmlp[0, 0]

    def sc_a(out):                   # per-output-channel dequant (attention)
        return out * sattn[0, 0] if quant else out

    def sc_m(out, lanes=None):       # per-output-channel dequant (MLP)
        if not quant:
            return out
        s = smlp[0, 0]
        return out * (s[:, :lanes] if lanes is not None else s)

    # GEMM sites. In int4 mode each chunk holds nibble-packed row pairs
    # (r, r + R/2) with group-wise scales (_NG contraction groups, each with
    # a per-output-channel scale row): the kernel runs one MXU pass per
    # group and scales each f32 partial before accumulating. Groups 0..3
    # live in the low-nibble half, 4..7 in the high one, so every slice is
    # contiguous. fc2ᵀ chunks (axis 2 = outputs) group their *lane* axis
    # and compute the two output halves separately, concatenating lanes.
    half = cw // 2
    ng2 = _NG // 2

    def mm_a(xin):                   # attention chunks: [B,C] @ [C,C]
        if int4:
            lo, hi = _unpack_nibbles(wattn[0, 0], dtype)  # [C/2, C]
            g = cw // _NG
            out = jnp.zeros((xin.shape[0], cw), jnp.float32)
            for gi in range(ng2):
                sl = slice(gi * g, (gi + 1) * g)
                out += jnp.dot(xin[:, sl].astype(dtype), lo[sl],
                               preferred_element_type=jnp.float32
                               ) * sattn[0, 0, gi:gi + 1]
                out += jnp.dot(xin[:, half + gi * g:half + (gi + 1) * g
                                   ].astype(dtype), hi[sl],
                               preferred_element_type=jnp.float32
                               ) * sattn[0, 0, ng2 + gi:ng2 + gi + 1]
            return out
        return sc_a(jnp.dot(xin.astype(dtype), wa(),
                            preferred_element_type=jnp.float32))

    def mm_fc1(xin):                 # fc1 halves: [B,C] @ [C,2C]
        if int4:
            lo, hi = _unpack_nibbles(wmlp[0, 0], dtype)   # [C/2, 2C]
            g = cw // _NG
            out = jnp.zeros((xin.shape[0], 2 * cw), jnp.float32)
            for gi in range(ng2):
                sl = slice(gi * g, (gi + 1) * g)
                out += jnp.dot(xin[:, sl].astype(dtype), lo[sl],
                               preferred_element_type=jnp.float32
                               ) * smlp[0, 0, gi:gi + 1]
                out += jnp.dot(xin[:, half + gi * g:half + (gi + 1) * g
                                   ].astype(dtype), hi[sl],
                               preferred_element_type=jnp.float32
                               ) * smlp[0, 0, ng2 + gi:ng2 + gi + 1]
            return out
        return sc_m(jnp.dot(xin.astype(dtype), wm(),
                            preferred_element_type=jnp.float32))

    def mm_fc2(xin):                 # fc2ᵀ halves: [B,2C] · [C,2C] on lanes
        if int4:
            lo, hi = _unpack_nibbles(wmlp[0, 0], dtype)   # output halves
            xd = xin.astype(dtype)
            gm = 2 * cw // _NG
            o_lo = jnp.zeros((xin.shape[0], half), jnp.float32)
            o_hi = jnp.zeros((xin.shape[0], half), jnp.float32)
            for gi in range(_NG):
                gsl = slice(gi * gm, (gi + 1) * gm)
                o_lo += jax.lax.dot_general(
                    xd[:, gsl], lo[:, gsl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32
                    ) * smlp[0, 0, gi:gi + 1, :half]
                o_hi += jax.lax.dot_general(
                    xd[:, gsl], hi[:, gsl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32
                    ) * smlp[0, 0, gi:gi + 1, half:cw]
            return jnp.concatenate([o_lo, o_hi], axis=-1)
        return sc_m(jax.lax.dot_general(xin.astype(dtype), wm(),
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32),
                    lanes=cw)

    t = t_ref[0]
    j = pl.program_id(1)
    b, c = x_out.shape
    nb = kv.shape[2]
    d = c // n_head
    scale = jnp.float32(d) ** -0.5

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, j == 0))
    def _():
        x_out[:] = x_in[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (c, n_head), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (c, n_head), 1)
    seg = (lane // d == head).astype(dtype)                      # [C, H]
    segt = seg.T

    # ---- qkv projections (j = 0, 1, 2) ----
    # the [1, 3, C] qkv-bias block is fetched whole; select the row in-body
    # (sub-8 sublane blocks are not liftable into the index map)
    bias_j = jnp.where(j == 0, bqkv[0, 0:1],
                       jnp.where(j == 1, bqkv[0, 1:2], bqkv[0, 2:3]))

    @pl.when(j == 0)
    def _():
        xn_s[:] = _ln(x_out[:], ln1_s[0], ln1_b[0])
        m_s[:] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        den_s[:] = jnp.zeros(den_s.shape, jnp.float32)
        num_s[:] = jnp.zeros(num_s.shape, jnp.float32)
        q_s[:] = (mm_a(xn_s[:]) + bias_j) * scale

    @pl.when(j == 1)
    def _():
        k_s[:] = mm_a(xn_s[:]) + bias_j

    @pl.when(j == 2)
    def _():
        v_s[:] = mm_a(xn_s[:]) + bias_j
        if quantkv:
            # per-row symmetric int8: the caller commits the int8 rows and
            # their scales at position t
            sk = jnp.maximum(jnp.max(jnp.abs(k_s[:]), axis=1,
                                     keepdims=True), 1e-8) / 127.0   # [B, 1]
            sv = jnp.maximum(jnp.max(jnp.abs(v_s[:]), axis=1,
                                     keepdims=True), 1e-8) / 127.0
            kq = jnp.clip(jnp.round(k_s[:] / sk), -127, 127)
            vq = jnp.clip(jnp.round(v_s[:] / sv), -127, 127)
            kv_new[0] = jnp.concatenate([kq, vq], axis=-1).astype(kv_new.dtype)
            sc_new[0] = jnp.transpose(jnp.concatenate([sk, sv], axis=0))
        else:
            kv_new[0] = jnp.concatenate([k_s[:], v_s[:]],
                                        axis=-1).astype(kv_new.dtype)

    # ---- online-softmax accumulation over one KV chunk ----
    @pl.when(jnp.logical_and(j < kc, j * nb < t))
    def _():
        kchunk = kv[0, :, :, :c]                                 # [B, Nb, C]
        vchunk = kv[0, :, :, c:]
        if quantkv:
            kchunk = kchunk.astype(dtype)
            vchunk = vchunk.astype(dtype)
            srow = kv_sc[0]                                      # [Nb, 2B] f32
            sk_c = jnp.transpose(srow[:, :b])                    # [B, Nb]
            sv_c = jnp.transpose(srow[:, b:2 * b])               # [B, Nb]
        q = q_s[:]
        p = kchunk * q[:, None, :].astype(dtype)
        att = jax.lax.dot_general(
            p.reshape(b * nb, c), seg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(b, nb, n_head)
        if quantkv:
            att = att * sk_c[:, :, None]                         # dequant k
        row = j * nb + jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
        valid = row < t
        att = jnp.where(valid, att, -jnp.inf)
        m_new = jnp.maximum(m_s[:], jnp.max(att, axis=1))        # [B, H]
        alpha = jnp.exp(m_s[:] - m_new)
        e = jnp.where(valid, jnp.exp(att - m_new[:, None, :]), 0.0)
        den_s[:] = den_s[:] * alpha + jnp.sum(e, axis=1)
        # dequant v: fold the per-row v-scale into the softmax weights
        ev = e * sv_c[:, :, None] if quantkv else e
        aexp = jax.lax.dot_general(
            ev.astype(dtype).reshape(b * nb, n_head), segt,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype).reshape(b, nb, c)
        alpha_l = jnp.dot(alpha.astype(dtype), segt,
                          preferred_element_type=jnp.float32)    # [B, C]
        num_s[:] = (num_s[:] * alpha_l
                    + jnp.sum((aexp * vchunk).astype(jnp.float32), axis=1))
        m_s[:] = m_new

    # ---- attention finalize + output projection (j = KVS) ----
    @pl.when(j == kvs)
    def _():
        q, k_new, v_new = q_s[:], k_s[:], v_s[:]
        att_self = jnp.dot((k_new * q).astype(dtype), seg,
                           preferred_element_type=jnp.float32)   # [B, H]
        m_f = jnp.maximum(m_s[:], att_self)
        alpha = jnp.exp(m_s[:] - m_f)
        es = jnp.exp(att_self - m_f)
        denom = den_s[:] * alpha + es                            # [B, H]
        alpha_l = jnp.dot(alpha.astype(dtype), segt,
                          preferred_element_type=jnp.float32)
        num = (num_s[:] * alpha_l
               + jnp.dot(es.astype(dtype), segt,
                         preferred_element_type=jnp.float32) * v_new)
        den = jnp.dot(denom.astype(dtype), segt,
                      preferred_element_type=jnp.float32)
        y = (num / den).astype(dtype)
        x_out[:] = x_out[:] + mm_a(y) + bproj[0]

    # ---- MLP (j = KVS+1 .. KVS+4, fc1 half / fc2 half alternating) ----
    jm = j - (kvs + 1)

    @pl.when(jm == 0)
    def _():
        hn_s[:] = _ln(x_out[:], ln2_s[0], ln2_b[0])

    @pl.when(jnp.logical_and(jm >= 0, jm % 2 == 0))
    def _():
        b1 = jnp.where(jm == 0, bfc1[0, 0:1], bfc1[0, 1:2])
        h = mm_fc1(hn_s[:]) + b1
        h_s[:] = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))

    @pl.when(jnp.logical_and(jm >= 0, jm % 2 == 1))
    def _():
        # fc2 halves are packed transposed [C, 2C]; contract on axis 1
        # (per-row scales live in lanes [:C] of the smlp row)
        x = x_out[:] + mm_fc2(h_s[:])
        x_out[:] = jnp.where(jm == 3, x + bfc2[0], x)


def fused_decode_stack_chunked(x: jax.Array, packed: Dict[str, jax.Array],
                               kv_cache: jax.Array, t: jax.Array, *,
                               n_head: int, kv_scales: jax.Array = None,
                               compute_dtype=None, interpret: bool = False):
    """VMEM-bounded decode step for models whose layers exceed VMEM.

    Same contract as :func:`fused_decode_stack`, but ``packed`` comes from
    :func:`pack_decode_params_chunked` and ``kv_cache``'s N must be a
    multiple of 64.

    ``kv_scales`` [L, N, 2B] f32 enables the int8-KV mode: ``kv_cache`` holds
    per-row symmetric int8 (row r of layer i dequantizes as
    k = kv[i,:,r,:C]·scales[i,r,:B], v = kv[i,:,r,C:]·scales[i,r,B:]), the
    k-scale is applied to the attention logits and the v-scale folded into
    the softmax weights, and the return grows a third element: the [L, 1, 2B]
    scale row for position t (commit next to the int8 rows). Halves the KV
    stream — the second-largest HBM term of the decode step after weights.
    """
    l, b, n, c2 = kv_cache.shape
    c = c2 // 2
    quantkv = kv_scales is not None
    if quantkv and kv_cache.dtype != jnp.int8:
        raise ValueError("kv_scales given but kv_cache is not int8")
    dtype = compute_dtype
    if dtype is None:
        dtype = jnp.bfloat16 if kv_cache.dtype == jnp.int8 else kv_cache.dtype
    quant = "sattn" in packed
    # int4 chunks are nibble-packed along axis 2 (pack_decode_params_chunked)
    int4 = quant and packed["wattn"].shape[2] * 2 == c
    cr = c // 2 if int4 else c       # stored chunk row count
    if n % _NB:
        raise ValueError(f"chunked decode needs N % {_NB} == 0, got {n}")
    kc = n // _NB
    kvs = max(kc, 3)
    s = kvs + 5

    def widx(i, j, t):
        jc = jnp.where(j < 3, j, jnp.where(j < kvs, 2,
                       jnp.where(j == kvs, 3, 3)))
        return (i, jc, 0, 0)

    def midx(i, j, t):
        return (i, jnp.clip(j - kvs - 1, 0, 3), 0, 0)

    def kvidx(i, j, t):
        hist = jnp.maximum((t[0] + _NB - 1) // _NB - 1, 0)
        return (i, 0, jnp.minimum(jnp.minimum(j, kc - 1), hist), 0)

    def kvscidx(i, j, t):
        hist = jnp.maximum((t[0] + _NB - 1) // _NB - 1, 0)
        return (i, jnp.minimum(jnp.minimum(j, kc - 1), hist), 0)

    scale_specs = []
    scale_args = []
    if quant:
        # f32 dequant scale rows, streamed with the same index maps as their
        # weight chunks (tiny blocks — [1, C] per-channel rows for int8,
        # [_NG, C] group-wise stacks for int4; negligible DMA either way)
        sr = _NG if int4 else 1
        scale_specs = [
            pl.BlockSpec((1, 1, sr, c), widx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sr, 2 * c), midx, memory_space=pltpu.VMEM),
        ]
        scale_args = [packed["sattn"], packed["smlp"]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, s),
        in_specs=[
            pl.BlockSpec((b, c), lambda i, j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cr, c), widx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cr, 2 * c), midx, memory_space=pltpu.VMEM),
            *scale_specs,
            pl.BlockSpec((1, 3, c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2 * c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, _NB, c2), kvidx, memory_space=pltpu.VMEM),
            *([pl.BlockSpec((1, _NB, 2 * b), kvscidx,
                            memory_space=pltpu.VMEM)] if quantkv else []),
        ],
        out_specs=[
            pl.BlockSpec((b, c), lambda i, j, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, c2), lambda i, j, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *([pl.BlockSpec((1, 1, 2 * b), lambda i, j, t: (i, 0, 0),
                            memory_space=pltpu.VMEM)] if quantkv else []),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.float32),       # xn
            pltpu.VMEM((b, c), jnp.float32),       # q
            pltpu.VMEM((b, c), jnp.float32),       # k_new
            pltpu.VMEM((b, c), jnp.float32),       # v_new
            pltpu.VMEM((b, n_head), jnp.float32),  # m
            pltpu.VMEM((b, n_head), jnp.float32),  # denom
            pltpu.VMEM((b, c), jnp.float32),       # num
            pltpu.VMEM((b, c), jnp.float32),       # ln2(x)
            pltpu.VMEM((b, 2 * c), jnp.float32),   # gelu(fc1 half)
        ],
    )
    if quantkv:
        if not quant:
            raise ValueError("int8 KV requires int8 weights (quant='int8kv')")
        kern_fn = _chunked_kernel_qkv
    else:
        kern_fn = _chunked_kernel_q if quant else _chunked_kernel
    kern = functools.partial(kern_fn, n_head=n_head, dtype=dtype, kc=kc,
                             kvs=kvs, int4=int4)
    out_shape = [jax.ShapeDtypeStruct((b, c), jnp.float32),
                 jax.ShapeDtypeStruct((l, b, c2), kv_cache.dtype)]
    if quantkv:
        out_shape.append(jax.ShapeDtypeStruct((l, 1, 2 * b), jnp.float32))
    # the default 16 MB scoped-vmem budget is a compiler cap, not the
    # hardware's (v5e has 128 MB); the resident blocks here peak at ~21 MB
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray([t], jnp.int32), x.astype(jnp.float32),
      packed["wattn"], packed["wmlp"], *scale_args, packed["bqkv"],
      packed["ln1_s"], packed["ln1_b"], packed["bproj"], packed["ln2_s"],
      packed["ln2_b"], packed["bfc1"], packed["bfc2"], kv_cache,
      *([kv_scales] if quantkv else []))
    return tuple(outs)


# ---------------------------------------------------------------------------
# Plain-XLA executable spec (tests / CPU fallback) — identical math, unfused
# ---------------------------------------------------------------------------

def reference_decode_stack(x: jax.Array, packed: Dict[str, jax.Array],
                           kv_cache: jax.Array, t: jax.Array, *, n_head: int
                           ) -> Tuple[jax.Array, jax.Array]:
    l, b, n, c2 = kv_cache.shape
    c = c2 // 2
    d = c // n_head
    dtype = kv_cache.dtype
    x = x.astype(jnp.float32)
    news = []
    for i in range(l):
        xn = _ln(x, packed["ln1_s"][i], packed["ln1_b"][i]).astype(dtype)
        qkv = jnp.dot(xn, packed["wqkv"][i],
                      preferred_element_type=jnp.float32) + packed["bqkv"][i]
        q = (qkv[:, :c] * d ** -0.5).reshape(b, n_head, d)
        k_new, v_new = qkv[:, c:2 * c], qkv[:, 2 * c:]
        kc = kv_cache[i, :, :, :c].reshape(b, n, n_head, d)
        vc = kv_cache[i, :, :, c:].reshape(b, n, n_head, d)
        att = jnp.einsum("bhd,bnhd->bnh", q.astype(dtype), kc,
                         preferred_element_type=jnp.float32)
        att_self = jnp.einsum("bhd,bhd->bh", q, k_new.reshape(b, n_head, d))
        valid = (jnp.arange(n) < t)[None, :, None]
        att = jnp.where(valid, att, -jnp.inf)
        m = jnp.maximum(jnp.max(att, axis=1), att_self)
        e = jnp.where(valid, jnp.exp(att - m[:, None, :]), 0.0)
        es = jnp.exp(att_self - m)
        denom = jnp.sum(e, axis=1) + es
        num = jnp.einsum("bnh,bnhd->bhd", e.astype(dtype), vc,
                         preferred_element_type=jnp.float32)
        num = num + es[..., None] * v_new.reshape(b, n_head, d)
        y = (num / denom[..., None]).reshape(b, c).astype(dtype)
        x = x + jnp.dot(y, packed["wproj"][i],
                        preferred_element_type=jnp.float32) + packed["bproj"][i]
        hn = _ln(x, packed["ln2_s"][i], packed["ln2_b"][i]).astype(dtype)
        h = jnp.dot(hn, packed["wfc1"][i],
                    preferred_element_type=jnp.float32) + packed["bfc1"][i]
        h = jax.nn.gelu(h, approximate=False).astype(dtype)
        x = x + jnp.dot(h, packed["wfc2"][i],
                        preferred_element_type=jnp.float32) + packed["bfc2"][i]
        news.append(jnp.concatenate([k_new, v_new], axis=-1).astype(dtype))
    return x, jnp.stack(news)
