"""Fused Pallas TPU kernel: discrete VQ-diffusion reverse-sampler step.

One launch computes, per reverse step, everything between the denoiser's raw
logits and the sampled token indices (reference
diffusion_vq_official.py:210-304):

    log_softmax + mask-pad clamp (predict_start)
    → q_posterior on the one-hot carry (structured form, see
      :meth:`..diffusion.discrete.DiscreteDiffusion.q_posterior_idx`)
    → Gumbel-argmax categorical sample.

The XLA path makes ~10 K-wide [B, N, K] HBM passes per step (softmax,
posterior normalize, q_pred chains, gumbel add, argmax); here the only HBM
traffic is the logits read, the gumbel-noise read, and the [B, N] index
write — everything else stays in VMEM. For the TransformerPredictor prior
(tiny denoiser, K = 1025) the posterior math dominates the chain, so this is
the sampler's roofline fix.

Exact token parity with the XLA path: the gumbel tensor is generated outside
with the same key/shape as ``sample_categorical_idx``, and tie-breaking
matches ``jnp.argmax`` (first max wins; the mask class is the last column).

Grid is (B,): one program per batch row holds the full [N, K] tile in VMEM
(N ≤ 512 everywhere in this framework; guarded in the wrapper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = -70.0
_LZ = float(np.log(1e-30))


def _monotone_key(x):
    """f32 → uint32 order-preserving key (for exact in-kernel top-k).

    ``x + 0.0`` first maps −0.0 → +0.0 so the key order matches float
    comparison at zero; then the standard sign-flip trick: negative floats
    get all bits flipped, positives get the sign bit set.
    """
    u = jax.lax.bitcast_convert_type(x + 0.0, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _kth_largest_key(key_nm, key_last, k: int):
    """Exact k-th largest uint32 key per row over [key_nm | key_last]
    (radix select, MSB→LSB, 32 unrolled steps). Returns [N, 1] uint32.

    Mirrors ``jax.lax.top_k(logits, k)[0][..., -1]`` without sorting: at
    each bit, count candidates that match the chosen prefix and have the
    bit set; descend into that half iff it still holds the k-th element.
    """
    n = key_nm.shape[0]
    p = jnp.zeros((n, 1), jnp.uint32)
    kk = jnp.full((n, 1), k, jnp.int32)
    for i in range(31, -1, -1):
        hi = jnp.uint32((0xFFFFFFFF << (i + 1)) & 0xFFFFFFFF) if i < 31 \
            else jnp.uint32(0)
        bit = jnp.uint32(1 << i)
        cand_nm = ((key_nm & hi) == p) & ((key_nm & bit) != 0)
        cand_last = ((key_last & hi) == p) & ((key_last & bit) != 0)
        c1 = (jnp.sum(cand_nm.astype(jnp.int32), axis=1, keepdims=True)
              + jnp.sum(cand_last.astype(jnp.int32), axis=1, keepdims=True))
        take1 = kk <= c1
        p = jnp.where(take1, p | bit, p)
        kk = jnp.where(take1, kk, kk - c1)
    return p


def _gumbel_from_bits(bits: jax.Array) -> jax.Array:
    """uint32 random bits → Gumbel noise, matching the XLA path's transform
    (``-log(-log(u + 1e-30) + 1e-30)``) with u drawn uniformly on [0, 1) at
    24-bit resolution (the float32 mantissa width, as jax.random.uniform).

    Same *distribution* as :meth:`DiscreteDiffusion._gumbel`, different
    stream — the in-kernel PRNG variant trades token-identity for removing
    the [B, N, K] gumbel HBM round trip.
    """
    # Mosaic has no u32→f32 cast; the 24-bit value fits int32, so bitcast
    # through s32 first (identical value, supported s32→f32 cast).
    u24 = jax.lax.bitcast_convert_type(bits >> 8, jnp.int32)
    u = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return -jnp.log(-jnp.log(u + 1e-30) + 1e-30)


def _posterior_body(lf, xt_ref, coef_ref, g, out_ref, trunc_k: int):
    """Shared kernel body: raw logits tile [N, K-1] + carry + coefs + gumbel
    tile [N, K] → sampled index column written to ``out_ref``."""
    n, km1 = lf.shape

    # predict_start post-processing (reference :237-246)
    m = jnp.max(lf, axis=1, keepdims=True)
    lse_m = m + jnp.log(jnp.sum(jnp.exp(lf - m), axis=1, keepdims=True))
    log_x0 = jnp.clip(lf - lse_m, LOG_EPS, 0.0)
    # (predict_start's mask-pad column is dropped by the posterior's
    # q = log_x0[..., :-1] - log_qt and never reaches the sample)

    xt = xt_ref[0]                                         # [N, 1] int32
    is_mask = xt == km1                                    # [N, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, km1), 1)
    at_col = (cols == xt) & jnp.logical_not(is_mask)       # [N, K-1]

    # coefs live in SMEM as the FULL [B, 16] array (Mosaic requires sub-array
    # blocks to be (8,128)-aligned, which a [1,16] row block is not); each
    # program picks its batch row by grid index.
    c = lambda i: coef_ref[pl.program_id(0), i]
    log_att, log_btt, log_ctt = c(0), c(1), c(2)
    log_at, log_bt, log_ct = c(3), c(4), c(5)
    log_att_m1, log_btt_m1 = c(6), c(7)
    log_ctt_m1, log_1mctt_m1 = c(8), c(9)
    log_att_btt = jnp.logaddexp(log_att, log_btt)
    log_at_bt = jnp.logaddexp(log_at, log_bt)

    # q_pred(onehot x_t, t)[..., :-1]; masked rows := log ctt̄
    log_qt = jnp.where(at_col, log_att_btt,
                       jnp.where(is_mask, log_ctt, log_btt))
    q_nm = log_x0 - log_qt                                 # [N, K-1]
    # logsumexp over [q_nm | log 1e-30]
    m2 = jnp.maximum(jnp.max(q_nm, axis=1, keepdims=True), _LZ)
    s = jnp.sum(jnp.exp(q_nm - m2), axis=1, keepdims=True) + jnp.exp(_LZ - m2)
    q_lse = m2 + jnp.log(s)                                # [N, 1]
    qn = q_nm - q_lse
    qn_last = _LZ - q_lse                                  # [N, 1]

    # q_pred(qn, t-1)
    qp_nm = jnp.logaddexp(qn + log_att_m1, log_btt_m1)
    qp_last = jnp.logaddexp(qn_last + log_1mctt_m1, log_ctt_m1)

    # q_pred_one_timestep(onehot x_t, t): last col := log 1e-30,
    # masked rows := [log ct, ..., log ct, 0]
    qt1_nm = jnp.where(at_col, log_at_bt, jnp.where(is_mask, log_ct, log_bt))
    qt1_last = jnp.where(is_mask, 0.0, _LZ)

    ev_nm = jnp.clip(qp_nm + qt1_nm + q_lse, LOG_EPS, 0.0)
    ev_last = jnp.clip(qp_last + qt1_last + q_lse, LOG_EPS, 0.0)

    score = ev_nm + g[:, :km1]
    score_last = ev_last + g[:, km1:]

    if trunc_k:
        # truncated top-r sampling (reference vq_diffusion.py:291-304):
        # keep only the trunc_k largest posterior log-probs per row.
        # Exact threshold via radix select on monotone keys — matches
        # jax.lax.top_k's kth value bit-for-bit (ties at the threshold kept,
        # as in the XLA path's `logits < kth` masking).
        key_nm = _monotone_key(ev_nm)
        key_last = _monotone_key(ev_last)
        kth = _kth_largest_key(key_nm, key_last, trunc_k)  # [N, 1]
        score = jnp.where(key_nm >= kth, score, -3e38)
        score_last = jnp.where(key_last >= kth, score_last, -3e38)

    best = jnp.argmax(score, axis=1, keepdims=True)        # [N, 1]
    best_v = jnp.max(score, axis=1, keepdims=True)
    # dense argmax tie-break: first max wins, and the mask class is last
    out_ref[0] = jnp.where(score_last > best_v, km1, best).astype(jnp.int32)


def _kernel(logits_ref, xt_ref, coef_ref, gumbel_ref, out_ref, *,
            trunc_k: int = 0):
    _posterior_body(logits_ref[0].astype(jnp.float32), xt_ref, coef_ref,
                    gumbel_ref[0], out_ref, trunc_k)


def _kernel_prng(logits_ref, xt_ref, coef_ref, seed_ref, out_ref, *,
                 trunc_k: int = 0):
    """Variant that draws the gumbel noise from the core's hardware PRNG
    instead of reading a [N, K] tile from HBM: per-step traffic drops to the
    logits read + the [N] index write (~⅓ of the gumbel-fed kernel's, since
    XLA also pays a full write to *materialize* the gumbel tensor).

    NOT token-identical to the XLA path (different stream, same Gumbel
    distribution); TPU-only (``pltpu.prng_*`` has no interpret lowering in
    this jax). Seeded per (batch row, step) from two SMEM words.
    """
    lf = logits_ref[0].astype(jnp.float32)                 # [N, K-1]
    n, km1 = lf.shape
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[b, 0], seed_ref[b, 1])
    bits = pltpu.prng_random_bits((n, km1 + 1))
    g = _gumbel_from_bits(jax.lax.bitcast_convert_type(bits, jnp.uint32))
    _posterior_body(lf, xt_ref, coef_ref, g, out_ref, trunc_k)


def gather_posterior_coefs(sched, t_post: jax.Array,
                           num_timesteps: int) -> jax.Array:
    """[B] timesteps → [B, 10] per-row schedule scalars (t and t−1, with the
    reference's (t+T+1) mod (T+1) wraparound for t−1, :175-208)."""
    tm1 = (t_post - 1 + num_timesteps + 1) % (num_timesteps + 1)
    return jnp.stack([
        sched.log_cumprod_at[t_post], sched.log_cumprod_bt[t_post],
        sched.log_cumprod_ct[t_post],
        sched.log_at[t_post], sched.log_bt[t_post], sched.log_ct[t_post],
        sched.log_cumprod_at[tm1], sched.log_cumprod_bt[tm1],
        sched.log_cumprod_ct[tm1], sched.log_1_min_cumprod_ct[tm1],
    ], axis=1).astype(jnp.float32)


# VMEM budget: the body keeps ~12 live [N, K]-wide f32 arrays (inputs,
# log_x0/q_nm/qn chain, q_pred pieces, score) plus double-buffered input
# blocks. v5e has 128 MB physical; we raise the compiler's 16 MB default to
# 64 MB and admit shapes whose worst-case footprint fits with headroom.
_VMEM_LIMIT = 64 * 2 ** 20
_LIVE_ARRAYS = 16  # conservative: 12 live + double-buffered in/out blocks


def fits_vmem(n: int, k: int) -> bool:
    """True if one batch-row tile of the fused kernel fits the VMEM budget."""
    return n * k * 4 * _LIVE_ARRAYS <= _VMEM_LIMIT


@functools.partial(jax.jit, static_argnames=("interpret", "trunc_k"))
def fused_posterior_sample(logits: jax.Array, x_t: jax.Array,
                           coefs: jax.Array, gumbel: jax.Array,
                           interpret: bool = False,
                           trunc_k: int = 0) -> jax.Array:
    """One reverse step: raw denoiser logits [B, N, K-1], one-hot carry
    indices [B, N], coefs from :func:`gather_posterior_coefs`, gumbel noise
    [B, N, K] → sampled indices [B, N] int32. ``trunc_k > 0`` restricts the
    sample to the trunc_k most probable classes (truncated top-r sampling)."""
    b, n, km1 = logits.shape
    k = km1 + 1
    assert fits_vmem(n, k), "row tile too large for VMEM; use the XLA path"
    out = pl.pallas_call(
        functools.partial(_kernel, trunc_k=int(trunc_k)),
        grid=(b,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[
            pl.BlockSpec((1, n, km1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 1), jnp.int32),
        interpret=interpret,
    )(logits, x_t[..., None].astype(jnp.int32),
      jnp.pad(coefs, ((0, 0), (0, 16 - coefs.shape[1]))), gumbel)
    return out[..., 0]


@functools.partial(jax.jit, static_argnames=("trunc_k",))
def fused_posterior_sample_prng(logits: jax.Array, x_t: jax.Array,
                                coefs: jax.Array, seeds: jax.Array,
                                trunc_k: int = 0) -> jax.Array:
    """:func:`fused_posterior_sample` with in-kernel hardware-PRNG gumbel:
    ``seeds`` is [B, 2] int32 (one fresh pair per batch row and step, e.g.
    ``jax.random.bits(rng, (b, 2), jnp.uint32)``). Same sampling
    distribution, different stream — NOT token-identical to the XLA path.
    TPU-only (no interpret lowering for ``pltpu.prng_*``)."""
    b, n, km1 = logits.shape
    k = km1 + 1
    assert fits_vmem(n, k), "row tile too large for VMEM; use the XLA path"
    if seeds.dtype == jnp.uint32:  # bitcast: astype past 2^31 is UB
        seeds = jax.lax.bitcast_convert_type(seeds, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel_prng, trunc_k=int(trunc_k)),
        grid=(b,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[
            pl.BlockSpec((1, n, km1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 1), jnp.int32),
    )(logits, x_t[..., None].astype(jnp.int32),
      jnp.pad(coefs, ((0, 0), (0, 16 - coefs.shape[1]))),
      seeds.astype(jnp.int32))
    return out[..., 0]
