"""Fused Pallas TPU kernel for codebook nearest-neighbour search.

The hot op of every stage-1 forward pass (SURVEY §3 hot-loop ③, reference
codebook.py:70-85): for N = B·H·W latent vectors find
``argmin_k ||z - e_k||²`` over the K×D codebook.

The XLA fallback (:func:`..models.codebook.nearest_codebook_indices`)
materializes the [N, K] distance matrix in HBM before the argmin. This kernel
tiles N over the grid, keeps the codebook and the distance tile resident in
VMEM, and fuses matmul (MXU) + row-min reduction (VPU) so only the [N] index
vector ever reaches HBM: HBM traffic drops from O(N·K) to O(N·D + K·D + N).

``||z||²`` is constant per row and dropped from the argmin. Distances
accumulate in f32 regardless of input dtype (bf16 inputs hit the MXU natively).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Round-1 measurement at (N=8192, K=1024, D=256) was parity-within-noise;
# round-2 amortized chained-dispatch timing showed the v1 kernel LOSING 0.28×
# to XLA's fused matmul+argmin (BENCHMARKS.md). v2 (this file) attacks the two
# v1 costs:
#   1. `jnp.argmin` along the LANE axis lowers to a slow cross-lane
#      reduction in Mosaic → replaced by min + (iota where dist==min) min,
#      two fast lane reductions with identical first-min-index semantics;
#   2. the f32 scores matmul runs the MXU in multi-pass f32 mode → optional
#      `precision="bf16"` casts the operands (f32 accumulate) for the full
#      MXU rate; exact f32 remains the default (argmin can flip on
#      near-ties under bf16 scores).
TILE_N = 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(z_ref, cb_ref, cb_sq_ref, out_ref, *, bf16_scores: bool):
    z = z_ref[:]                       # [TILE_N, D]
    cb = cb_ref[:]                     # [K, D]
    if bf16_scores:
        z = z.astype(jnp.bfloat16)
        cb = cb.astype(jnp.bfloat16)
    # dist = -2 z·cbᵀ + ||cb||²   (row-constant ||z||² omitted). f32 mode
    # must say precision=HIGHEST explicitly: the TPU default bf16-rounds the
    # operands even with an f32 accumulator, silently making "f32" ≡ "bf16"
    # (measured: 0.5% argmin flips vs the true f32 distance).
    scores = jax.lax.dot_general(
        z, cb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT if bf16_scores
                   else jax.lax.Precision.HIGHEST))  # MXU [TILE_N, K]
    dist = cb_sq_ref[:] - 2.0 * scores               # [1, K] broadcast
    # argmin via two lane-reductions (first-min-index semantics): a direct
    # jnp.argmin along lanes is the measured v1 bottleneck. An all-NaN row
    # makes `dist == m` all-false (NaN != NaN), which would yield the
    # out-of-range index k — clamp keeps it in range (jnp.argmin would have
    # picked an arbitrary in-range index for NaN rows too).
    k = dist.shape[1]
    m = jnp.min(dist, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx = jnp.min(jnp.where(dist == m, iota, k), axis=1, keepdims=True)
    out_ref[:] = jnp.minimum(idx, k - 1).astype(jnp.int32)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def nearest_indices_pallas(z_flat: jax.Array, codebook: jax.Array,
                           precision: str = "f32") -> jax.Array:
    """[N, D] × [K, D] → [N] int32 nearest-codebook indices."""
    return _nearest_indices_impl(z_flat, codebook, precision)


@nearest_indices_pallas.defjvp
def _nearest_indices_jvp(precision, primals, tangents):
    # integer argmin output: no tangent (pallas_call has no autodiff rule, so
    # we declare the op non-differentiable explicitly)
    import numpy as _np
    out = _nearest_indices_impl(*primals, precision)
    zero = _np.zeros(out.shape, jax.dtypes.float0)
    return out, zero


@functools.partial(jax.jit, static_argnames=("precision",))
def _nearest_indices_impl(z_flat: jax.Array, codebook: jax.Array,
                          precision: str = "f32") -> jax.Array:
    n, d = z_flat.shape
    k = codebook.shape[0]
    n_pad = _round_up(max(n, 8), TILE_N)
    if n_pad != n:
        z_flat = jnp.pad(z_flat, ((0, n_pad - n), (0, 0)))

    cb_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]  # [1, K]

    grid = (n_pad // TILE_N,)
    out = pl.pallas_call(
        functools.partial(_kernel, bf16_scores=(precision == "bf16")),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d,
            bytes_accessed=n_pad * d * 4 + k * d * 4 + n_pad * 4,
            transcendentals=0,
        ),
    )(z_flat, codebook, cb_sq)
    return out[:n, 0]
