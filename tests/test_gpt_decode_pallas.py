"""Fused GPT decode-stack kernel (ops/gpt_decode_pallas.py).

Verifies, in interpret mode on CPU:
- the Pallas kernel against its plain-XLA executable spec;
- the kernel's lazy-append attention math against the module's
  ``GPT.decode_step`` (logits through ln_f/head, multi-step trajectory);
- the fused sampler end-to-end against the XLA sampler (token-identical at
  quasi-greedy temperature, prefix teacher-forcing included).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.models import mingpt
from vq_vae_gan_diffusion_tpu.models.mingpt import GPT, sample_tokens
from vq_vae_gan_diffusion_tpu.ops.gpt_decode_pallas import (
    fused_decode_stack, fused_decode_stack_chunked, pack_decode_params,
    pack_decode_params_chunked, reference_decode_stack)

B, N, L, H, C = 4, 32, 3, 8, 256


@pytest.fixture(scope="module")
def gpt_setup():
    gpt = GPT(vocab_size=64, block_size=N, n_layer=L, n_head=H, n_embd=C)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    # non-trivial weights so LN/attention/GELU paths are exercised
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)
    packed = pack_decode_params(params, L, dtype=jnp.float32)
    return gpt, params, packed


def _embed(gpt, params, token, t):
    x = gpt.apply({"params": params}, token[:, None],
                  method=lambda m, tok: m.tok_emb(tok))[:, 0]
    return x + params["pos_emb"][0, t]


def _head(gpt, params, h):
    return gpt.apply({"params": params}, h[:, None],
                     method=lambda m, hh: m.head(m.ln_f(hh)))[:, 0]


def test_kernel_matches_spec_and_decode_step(gpt_setup):
    """Multi-step trajectory: fused kernel ≡ XLA spec ≡ GPT.decode_step."""
    gpt, params, packed = gpt_setup
    tokens = jax.random.randint(jax.random.PRNGKey(1), (6, B), 0, 64)
    cache = gpt.apply({"params": params}, B, N, method=GPT.init_cache)
    kv = jnp.zeros((L, B, N, 2 * C), jnp.float32)
    for t in range(6):
        logits_mod, cache = gpt.apply({"params": params}, tokens[t], t, cache,
                                      method=GPT.decode_step)
        x = _embed(gpt, params, tokens[t], t)
        h_ref, news_ref = reference_decode_stack(x, packed, kv, jnp.int32(t),
                                                 n_head=H)
        h_fus, news_fus = fused_decode_stack(x, packed, kv, jnp.int32(t),
                                             n_head=H, interpret=True)
        np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_fus),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(news_ref), np.asarray(news_fus),
                                   rtol=2e-5, atol=2e-5)
        kv = jax.lax.dynamic_update_slice(kv, news_ref[:, :, None, :],
                                          (0, 0, t, 0))
        logits_fused = _head(gpt, params, h_fus)
        np.testing.assert_allclose(np.asarray(logits_mod),
                                   np.asarray(logits_fused),
                                   rtol=1e-4, atol=1e-4)


def test_fused_sampler_matches_xla_sampler(gpt_setup):
    """Quasi-greedy sampling: both paths pick identical tokens, including
    through a multi-token teacher-forced prefix."""
    gpt, params, _ = gpt_setup
    rng = jax.random.PRNGKey(7)
    prefix = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                              jax.random.randint(jax.random.PRNGKey(3),
                                                 (B, 5), 0, 64)], axis=1)
    kw = dict(prefix_len=6, steps=10, temperature=1e-4, top_k=10)
    toks_xla = sample_tokens(gpt, params, rng, prefix, fused=False, **kw)
    toks_fused = sample_tokens(gpt, params, rng, prefix, fused=True,
                               interpret=True, **kw)
    assert toks_xla.shape == toks_fused.shape == (B, 10)
    np.testing.assert_array_equal(np.asarray(toks_xla), np.asarray(toks_fused))


@pytest.mark.parametrize("n,ts", [
    # kc=2 (< the 3 qkv steps): chunk-clamp path, boundary positions
    (128, (0, 1, 63, 64, 65, 127)),
    # kc=5 (> 3): exercises the KV-only idle sub-steps j=3..4
    (320, (0, 65, 200, 319)),
])
def test_chunked_kernel_matches_spec(n, ts):
    """Chunked kernel ≡ XLA spec at chunk-boundary history lengths, with a
    randomly pre-filled cache (only rows < t may be read)."""
    b, l, h, c = 2, 2, 8, 256
    gpt = GPT(vocab_size=64, block_size=n, n_layer=l, n_head=h, n_embd=c)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)
    packed = pack_decode_params(params, l, dtype=jnp.float32)
    chunked = pack_decode_params_chunked(params, l, dtype=jnp.float32)
    kv = jax.random.normal(jax.random.PRNGKey(2), (l, b, n, 2 * c))
    x = jax.random.normal(jax.random.PRNGKey(3), (b, c))
    for t in ts:
        h_ref, news_ref = reference_decode_stack(x, packed, kv, jnp.int32(t),
                                                 n_head=h)
        h_chk, news_chk = fused_decode_stack_chunked(
            x, chunked, kv, jnp.int32(t), n_head=h, interpret=True)
        np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_chk),
                                   rtol=2e-5, atol=2e-5, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(news_ref), np.asarray(news_chk),
                                   rtol=2e-5, atol=2e-5, err_msg=f"t={t}")


def test_chunked_sampler_matches_xla_sampler(gpt_setup, monkeypatch):
    """Forcing the chunked variant end-to-end: token-identical quasi-greedy
    sampling vs the XLA path, 64-aligned cache included."""
    gpt, params, _ = gpt_setup
    monkeypatch.setattr(mingpt, "_whole_layer_footprint",
                        lambda *a: 1 << 40)
    rng = jax.random.PRNGKey(7)
    prefix = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                              jax.random.randint(jax.random.PRNGKey(3),
                                                 (B, 5), 0, 64)], axis=1)
    kw = dict(prefix_len=6, steps=10, temperature=1e-4, top_k=10)
    toks_xla = sample_tokens(gpt, params, rng, prefix, fused=False, **kw)
    toks_chk = sample_tokens(gpt, params, rng, prefix, fused=True,
                             interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(toks_xla), np.asarray(toks_chk))


def _dequantize_chunked(pq):
    """Reconstruct float chunk streams from an int8-packed dict, applying
    the per-output-channel scales the way the kernel does (fc2ᵀ chunks are
    row-scaled with the scales stored in lanes [:C])."""
    c = pq["wattn"].shape[-1]
    wattn = pq["wattn"].astype(jnp.float32) * pq["sattn"]
    halves = []
    for ci in range(4):
        w = pq["wmlp"][:, ci].astype(jnp.float32)
        if ci % 2 == 0:
            halves.append(w * pq["smlp"][:, ci])
        else:
            halves.append(w * pq["smlp"][:, ci, 0, :c][:, :, None])
    out = dict(pq)
    del out["sattn"], out["smlp"]
    out["wattn"] = wattn
    out["wmlp"] = jnp.stack(halves, axis=1)
    return out


def test_chunked_int8_matches_dequantized_kernel():
    """int8 chunk streams ≡ running the float kernel on the dequantized
    weights (scale-after-GEMM equals scale-into-weights up to fp reorder)."""
    b, l, h, c, n = 2, 2, 8, 256, 128
    gpt = GPT(vocab_size=64, block_size=n, n_layer=l, n_head=h, n_embd=c)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)
    pq = pack_decode_params_chunked(params, l, dtype=jnp.float32, quant="int8")
    assert pq["wattn"].dtype == jnp.int8 and pq["wmlp"].dtype == jnp.int8
    pdq = _dequantize_chunked(pq)
    kv = jax.random.normal(jax.random.PRNGKey(2), (l, b, n, 2 * c))
    x = jax.random.normal(jax.random.PRNGKey(3), (b, c))
    for t in (0, 65, 127):
        h_q, news_q = fused_decode_stack_chunked(x, pq, kv, jnp.int32(t),
                                                 n_head=h, interpret=True)
        h_dq, news_dq = fused_decode_stack_chunked(x, pdq, kv, jnp.int32(t),
                                                   n_head=h, interpret=True)
        np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_dq),
                                   rtol=1e-4, atol=1e-4, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(news_q), np.asarray(news_dq),
                                   rtol=1e-4, atol=1e-4, err_msg=f"t={t}")
    # and the quantization error itself is small: dequantized ≈ float spec
    packed = pack_decode_params(params, l, dtype=jnp.float32)
    h_ref, _ = reference_decode_stack(x, packed, kv, jnp.int32(65), n_head=h)
    h_q, _ = fused_decode_stack_chunked(x, pq, kv, jnp.int32(65),
                                        n_head=h, interpret=True)
    err = np.max(np.abs(np.asarray(h_q) - np.asarray(h_ref)))
    scale = np.max(np.abs(np.asarray(h_ref)))
    assert err / scale < 0.05, f"int8 relative error {err / scale:.4f}"


def test_int8_sampler_end_to_end(gpt_setup):
    """quant='int8' through sample_tokens: valid tokens, near-identical
    quasi-greedy choices vs the float path on this small model."""
    gpt, params, _ = gpt_setup
    rng = jax.random.PRNGKey(7)
    prefix = jnp.zeros((B, 1), jnp.int32)
    kw = dict(prefix_len=1, steps=12, temperature=1e-4, top_k=10)
    toks_fp = sample_tokens(gpt, params, rng, prefix, fused=False, **kw)
    toks_q = sample_tokens(gpt, params, rng, prefix, fused=True,
                           quant="int8", interpret=True, **kw)
    assert toks_q.shape == (B, 12)
    assert int(toks_q.min()) >= 0 and int(toks_q.max()) < 64
    agree = float(np.mean(np.asarray(toks_fp) == np.asarray(toks_q)))
    assert agree >= 0.75, f"int8 token agreement {agree:.2f}"


def test_chunked_int8kv_matches_dequantized_cache():
    """int8-KV mode ≡ the int8-weights kernel run on the dequantized float
    cache, and the committed (rows, scales) round-trip to the float rows."""
    b, l, h, c, n = 2, 2, 8, 256, 128
    gpt = GPT(vocab_size=64, block_size=n, n_layer=l, n_head=h, n_embd=c)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)
    pq = pack_decode_params_chunked(params, l, dtype=jnp.float32,
                                    quant="int8kv")
    kv_f = jax.random.normal(jax.random.PRNGKey(2), (l, b, n, 2 * c))
    # quantize the float cache per (layer, row, batch), k and v separately
    sk = jnp.maximum(jnp.max(jnp.abs(kv_f[..., :c]), -1), 1e-8) / 127.0
    sv = jnp.maximum(jnp.max(jnp.abs(kv_f[..., c:]), -1), 1e-8) / 127.0
    kq = jnp.clip(jnp.round(kv_f[..., :c] / sk[..., None]), -127, 127)
    vq = jnp.clip(jnp.round(kv_f[..., c:] / sv[..., None]), -127, 127)
    kv_q = jnp.concatenate([kq, vq], -1).astype(jnp.int8)
    # scales layout [L, N, 2B]: k-scales in [:, :, :B], v in [:, :, B:]
    scales = jnp.concatenate([jnp.swapaxes(sk, 1, 2),
                              jnp.swapaxes(sv, 1, 2)], -1)
    kv_dq = jnp.concatenate([kq * sk[..., None], vq * sv[..., None]], -1)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, c))
    for t in (1, 65, 127):
        h_kv, news_kv, sc_new = fused_decode_stack_chunked(
            x, pq, kv_q, jnp.int32(t), n_head=h, kv_scales=scales,
            compute_dtype=jnp.float32, interpret=True)
        h_dq, news_dq = fused_decode_stack_chunked(
            x, pq, kv_dq.astype(jnp.float32), jnp.int32(t), n_head=h,
            interpret=True)
        np.testing.assert_allclose(np.asarray(h_kv), np.asarray(h_dq),
                                   rtol=2e-2, atol=2e-2, err_msg=f"t={t}")
        # committed int8 rows × scales ≈ the float rows the plain path commits
        assert news_kv.dtype == jnp.int8 and sc_new.shape == (l, 1, 2 * b)
        sk_n, sv_n = sc_new[:, 0, :b], sc_new[:, 0, b:]          # [L, B]
        deq = jnp.concatenate(
            [news_kv[..., :c].astype(jnp.float32) * sk_n[..., None],
             news_kv[..., c:].astype(jnp.float32) * sv_n[..., None]], -1)
        np.testing.assert_allclose(np.asarray(deq), np.asarray(news_dq),
                                   rtol=2e-2, atol=2e-2, err_msg=f"t={t}")


def test_int8kv_sampler_end_to_end(gpt_setup):
    """quant='int8kv' through sample_tokens: valid tokens, high agreement
    with the float path at quasi-greedy temperature."""
    gpt, params, _ = gpt_setup
    rng = jax.random.PRNGKey(7)
    prefix = jnp.zeros((B, 1), jnp.int32)
    kw = dict(prefix_len=1, steps=12, temperature=1e-4, top_k=10)
    toks_fp = sample_tokens(gpt, params, rng, prefix, fused=False, **kw)
    toks_q = sample_tokens(gpt, params, rng, prefix, fused=True,
                           quant="int8kv", interpret=True, **kw)
    assert toks_q.shape == (B, 12)
    assert int(toks_q.min()) >= 0 and int(toks_q.max()) < 64
    agree = float(np.mean(np.asarray(toks_fp) == np.asarray(toks_q)))
    assert agree >= 0.75, f"int8kv token agreement {agree:.2f}"


def _unpack4(w8):
    """Undo _pack_nibbles: [..., R/2, O] int8 → [..., R, O] float (rows in
    original order: low nibbles are rows [0, R/2), high nibbles the rest)."""
    w32 = jnp.asarray(w8, jnp.int32)
    lo = (w32 & 15) - ((w32 & 8) << 1)
    hi = w32 >> 4
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)


def _dequantize_chunked4(pq):
    """Float chunk streams from an int4-packed dict: unpack nibbles, then
    apply the group-wise scales (contraction split into NG groups, each with
    a per-output-channel scale; fc2ᵀ groups its lane axis with per-row
    scales stored transposed in lanes [:C])."""
    c = pq["wattn"].shape[-1]
    ng = pq["sattn"].shape[2]
    wattn = _unpack4(pq["wattn"])                        # [L, 4, C, C]
    l = wattn.shape[0]
    wattn = (wattn.reshape(l, 4, ng, c // ng, c)
             * pq["sattn"][:, :, :, None, :]).reshape(l, 4, c, c)
    halves = []
    for ci in range(4):
        w = _unpack4(pq["wmlp"][:, ci])                  # [L, C, 2C]
        s = pq["smlp"][:, ci]                            # [L, NG, 2C]
        if ci % 2 == 0:    # fc1: contraction rows grouped
            w = (w.reshape(l, ng, c // ng, 2 * c) * s[:, :, None, :]
                 ).reshape(l, c, 2 * c)
        else:              # fc2ᵀ: contraction lanes grouped, per-row scales
            st = jnp.transpose(s[:, :, :c], (0, 2, 1))   # [L, C, NG]
            w = (w.reshape(l, c, ng, 2 * c // ng) * st[:, :, :, None]
                 ).reshape(l, c, 2 * c)
        halves.append(w)
    out = dict(pq)
    del out["sattn"], out["smlp"]
    out["wattn"] = wattn
    out["wmlp"] = jnp.stack(halves, axis=1)
    return out


def test_chunked_int4_matches_dequantized_kernel():
    """int4 nibble-packed chunk streams ≡ the float kernel on the unpacked ×
    scaled weights, and the end-to-end quantization error stays bounded."""
    b, l, h, c, n = 2, 2, 8, 256, 128
    gpt = GPT(vocab_size=64, block_size=n, n_layer=l, n_head=h, n_embd=c)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)
    pq = pack_decode_params_chunked(params, l, dtype=jnp.float32, quant="int4")
    assert pq["wattn"].dtype == jnp.int8 and pq["wattn"].shape == (l, 4, c // 2, c)
    assert pq["wmlp"].dtype == jnp.int8 and pq["wmlp"].shape == (l, 4, c // 2, 2 * c)
    assert pq["sattn"].shape == (l, 4, 8, c)
    assert pq["smlp"].shape == (l, 4, 8, 2 * c)
    pdq = _dequantize_chunked4(pq)
    # nibble range sanity: every unpacked value must be a valid int4 level
    for key in ("wattn", "wmlp"):
        vals = np.asarray(_unpack4(pq[key]))
        assert vals.min() >= -7 and vals.max() <= 7
    kv = jax.random.normal(jax.random.PRNGKey(2), (l, b, n, 2 * c))
    x = jax.random.normal(jax.random.PRNGKey(3), (b, c))
    for t in (0, 65, 127):
        h_q, news_q = fused_decode_stack_chunked(x, pq, kv, jnp.int32(t),
                                                 n_head=h, interpret=True)
        h_dq, news_dq = fused_decode_stack_chunked(x, pdq, kv, jnp.int32(t),
                                                   n_head=h, interpret=True)
        np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_dq),
                                   rtol=1e-4, atol=1e-4, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(news_q), np.asarray(news_dq),
                                   rtol=1e-4, atol=1e-4, err_msg=f"t={t}")
    # group-wise scales keep the int4 error bounded (measured ~3% here;
    # per-channel int4 scaling was ~25%)
    packed = pack_decode_params(params, l, dtype=jnp.float32)
    h_ref, _ = reference_decode_stack(x, packed, kv, jnp.int32(65), n_head=h)
    h_q, _ = fused_decode_stack_chunked(x, pq, kv, jnp.int32(65),
                                        n_head=h, interpret=True)
    err = np.max(np.abs(np.asarray(h_q) - np.asarray(h_ref)))
    scale = np.max(np.abs(np.asarray(h_ref)))
    assert err / scale < 0.10, f"int4 relative error {err / scale:.4f}"


def test_int4_sampler_token_identical_to_dequantized(gpt_setup, monkeypatch):
    """quant='int4' through sample_tokens is TOKEN-IDENTICAL to the float
    chunked sampler run on the int4-dequantized weights — the quantized
    kernel's only deviation from the float path is the weights themselves.
    (A straight vs-float agreement bound is not meaningful on this model:
    its random weights give near-flat logits, so the ~3% int4 error flips
    quasi-greedy ties that a trained model's logit gaps would not.)"""
    from vq_vae_gan_diffusion_tpu.ops import gpt_decode_pallas as gdp
    gpt, params, _ = gpt_setup
    rng = jax.random.PRNGKey(7)
    prefix = jnp.zeros((B, 1), jnp.int32)
    kw = dict(prefix_len=1, steps=12, temperature=1e-4, top_k=10)
    toks_q = sample_tokens(gpt, params, rng, prefix, fused=True,
                           quant="int4", interpret=True, **kw)
    assert toks_q.shape == (B, 12)
    assert int(toks_q.min()) >= 0 and int(toks_q.max()) < 64

    orig_pack = gdp.pack_decode_params_chunked
    monkeypatch.setattr(mingpt, "_whole_layer_footprint", lambda *a: 1 << 40)
    monkeypatch.setattr(
        gdp, "pack_decode_params_chunked",
        lambda p, nl, dtype=jnp.bfloat16, quant=None: _dequantize_chunked4(
            orig_pack(p, nl, dtype=dtype, quant="int4")))
    toks_dq = sample_tokens(gpt, params, rng, prefix, fused=True,
                            interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(toks_q), np.asarray(toks_dq))


def test_int4kv_sampler_agrees_with_int4(gpt_setup):
    """int4kv (same int4 weights + per-row int8 KV) samples valid tokens and
    stays in high agreement with plain int4 at quasi-greedy temperature —
    isolating the int8-KV error, which the int8kv tests already bound."""
    gpt, params, _ = gpt_setup
    rng = jax.random.PRNGKey(7)
    prefix = jnp.zeros((B, 1), jnp.int32)
    kw = dict(prefix_len=1, steps=12, temperature=1e-4, top_k=10)
    toks_4 = sample_tokens(gpt, params, rng, prefix, fused=True,
                           quant="int4", interpret=True, **kw)
    toks_4kv = sample_tokens(gpt, params, rng, prefix, fused=True,
                             quant="int4kv", interpret=True, **kw)
    assert toks_4kv.shape == (B, 12)
    assert int(toks_4kv.min()) >= 0 and int(toks_4kv.max()) < 64
    agree = float(np.mean(np.asarray(toks_4) == np.asarray(toks_4kv)))
    assert agree >= 0.75, f"int4kv vs int4 token agreement {agree:.2f}"


def test_auto_flag_defaults_to_xla_on_cpu(gpt_setup):
    """fused=None must not select the TPU kernel on the CPU backend."""
    gpt, params, _ = gpt_setup
    toks = sample_tokens(gpt, params, jax.random.PRNGKey(0),
                         jnp.zeros((B, 1), jnp.int32), prefix_len=1, steps=4)
    assert toks.shape == (B, 4)
