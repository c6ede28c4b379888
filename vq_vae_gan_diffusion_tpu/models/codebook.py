"""Vector-quantization codebook.

TPU-native re-design of reference ``network/vqvae/submodule/codebook.py:30-111``.

The hot op is nearest-neighbour search: for every latent vector z (B·H·W of
them), find ``argmin_k ||z - e_k||²`` over K codebook vectors, then gather. We
express the distance via the matmul expansion ``||z||² + ||e||² - 2 z·eᵀ`` so
the O(N·K·D) work lands on the MXU as ONE fused matmul+argmin. (A hand Pallas
kernel for this op was built and measured across rounds 1-4; its only mode
that beat XLA did so by recomputing scores in bf16, and once the same
numerics were given to XLA via ``precision='bf16'`` the gap closed to ~3%
— 707.7 vs 727.6 µs at 8192×1024×256 on a v5e, BENCHMARKS.md — so the
kernel was deleted per the round-3 win-or-delete directive. The 4.3 GFLOP
search sits at the dispatch floor; the precision knob is the real lever.)

Loss semantics (parity note): the reference computes

    loss = mean( (sg(z_q) - z)² + β·mean((z_q - sg(z))²) )        (codebook.py:96-103)

i.e. the *encoder-commitment* term carries weight 1.0 and the *codebook* term
carries weight β — swapped relative to the VQ-VAE paper. Because the inner
mean is a scalar added to every element of the outer mean's argument, this is
exactly ``mean((sg(z_q)-z)²) + β·mean((z_q-sg(z))²)``, which is what we
compute. Straight-through estimator: ``z_q = z + sg(z_q - z)`` (codebook.py:106).

Codebook init: U(-1/K, 1/K) (codebook.py:43-45).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def nearest_codebook_indices(z_flat: jax.Array, codebook: jax.Array,
                             precision: str = "exact") -> jax.Array:
    """argmin_k ||z - e_k||² via the matmul expansion. [N, D] × [K, D] → [N] int32.

    ||z||² is constant in k and dropped from the argmin.

    ``precision``: 'exact' runs the distance matmul at Precision.HIGHEST — the
    TPU default would bf16-round the operands, which flips ~0.5% of argmins vs
    the true f32 distance (measured on v5e) — at ~3× the matmul cost on a
    4.3 GFLOP op that sits at the dispatch floor. 'bf16' accepts the rounded
    scores for the full single-pass MXU rate (the quality A/B in
    tools/ab_codebook_precision.py showed the flips are training-neutral).
    """
    zf = z_flat.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    if precision == "bf16":
        # EXPLICIT bf16 operand casts (f32 accumulate): identical numerics to
        # the TPU MXU's default single-pass rounding AND reproducible on the
        # CPU backend (where Precision.DEFAULT would stay full-f32, making a
        # CPU quality A/B vacuous). Matches the Pallas kernel's bf16 mode.
        zf, cb = zf.astype(jnp.bfloat16), cb.astype(jnp.bfloat16)
    dist = (-2.0) * jax.lax.dot_general(
        zf, cb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if precision == "exact"
                   else jax.lax.Precision.DEFAULT)
    ) + jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def quantize(z: jax.Array, codebook: jax.Array, beta: float = 0.25,
             precision: str = "exact"
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize latents against the codebook.

    Args:
      z: [B, H, W, D] encoder output (NHWC; reference permutes NCHW→NHWC first,
         codebook.py:63 — our native layout needs no permute).
      codebook: [K, D] embedding table.
      beta: codebook-term weight (see module docstring).
      precision: distance-score precision, see nearest_codebook_indices.

    Returns:
      (z_q, indices, loss): straight-through quantized latents [B,H,W,D],
      int32 indices [B,H,W], scalar f32 VQ loss.
    """
    b, h, w, d = z.shape
    z_flat = z.reshape(-1, d)
    indices = nearest_codebook_indices(z_flat, codebook, precision)
    z_q = jnp.take(codebook, indices, axis=0).reshape(b, h, w, d).astype(z.dtype)

    zf = z.astype(jnp.float32)
    zqf = z_q.astype(jnp.float32)
    commit = jnp.mean((jax.lax.stop_gradient(zqf) - zf) ** 2)
    codebook_term = jnp.mean((zqf - jax.lax.stop_gradient(zf)) ** 2)
    loss = commit + beta * codebook_term

    z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
    return z_q, indices.reshape(b, h, w), loss


class CodeBook(nn.Module):
    """Learnable codebook module wrapping :func:`quantize`."""

    num_codebook_vectors: int = 1024
    latent_dim: int = 256
    beta: float = 0.25
    precision: str = "exact"     # 'exact' | 'bf16' distance scores
    dtype: Any = jnp.float32

    def setup(self):
        k = self.num_codebook_vectors
        self.embedding = self.param(
            "embedding",
            lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -1.0 / k, 1.0 / k),
            (k, self.latent_dim),
        )

    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return quantize(z, self.embedding, self.beta, self.precision)

    def lookup(self, indices: jax.Array) -> jax.Array:
        """indices [...] → embeddings [..., D] (reference z_to_image path)."""
        return jnp.take(self.embedding, indices, axis=0)
