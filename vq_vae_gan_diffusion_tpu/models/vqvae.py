"""VQ-VAE: encoder → quant conv → codebook → post-quant conv → decoder.

Parity with reference ``network/vqvae/vqvae.py:32-204``:

- config-driven assembly from the ``architecture.vqvae`` subtree and the
  dataset tables (vqvae.py:44-55);
- 1×1 ``quant_conv`` / ``post_quant_conv`` around the codebook (vqvae.py:83-84);
- ``__call__`` returns (decoded_images, codebook_indices, codebook_loss)
  (vqvae.py:116-137); ``encode``/``decode`` split (vqvae.py:139-153).

The reference's ``calculate_lambda`` / ``adopt_weight`` GAN helpers
(vqvae.py:155-204) are autodiff-orchestration, not model structure — in JAX
they live in the VQGAN train step (:mod:`..train.vqgan_worker`) where the two
extra VJPs w.r.t. the final decoder kernel are computed inside the single
jitted step.

Freezing (vqvae.py:96-113) is likewise a trainer concern: frozen VQVAE params
are passed through ``jax.lax.stop_gradient`` / kept out of the optimizer pytree
by stage-2 workers.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config, resolve_img_channels, resolve_img_size
from .codebook import CodeBook
from .decoder import Decoder
from .encoder import Encoder


class VQVAE(nn.Module):
    img_size: int = 256
    img_channels: int = 3
    latent_channels: int = 256
    latent_size: int = 16
    intermediate_channels: Tuple[int, ...] = (128, 128, 256, 256, 512)
    num_residual_blocks_encoder: int = 2
    num_residual_blocks_decoder: int = 3
    dropout: float = 0.0
    attention_resolution: Tuple[int, ...] = (16,)
    num_codebook_vectors: int = 1024
    beta: float = 0.25
    # 'exact' (Precision.HIGHEST distances) or 'bf16' (TPU-default rounded
    # scores, full single-pass MXU rate, ~0.5% argmin flips — training-neutral
    # per tools/ab_codebook_precision.py)
    codebook_precision: str = "exact"
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: Config, dtype=jnp.float32) -> "VQVAE":
        vq = cfg.architecture.vqvae
        return cls(
            img_size=resolve_img_size(cfg),
            img_channels=resolve_img_channels(cfg),
            latent_channels=int(vq.latent_channels),
            latent_size=int(vq.latent_size),
            intermediate_channels=tuple(vq.intermediate_channels),
            num_residual_blocks_encoder=int(vq.num_residual_blocks_encoder),
            num_residual_blocks_decoder=int(vq.num_residual_blocks_decoder),
            dropout=float(vq.dropout),
            attention_resolution=tuple(vq.attention_resolution),
            num_codebook_vectors=int(vq.num_codebook_vectors),
            codebook_precision=str(vq.get("codebook_precision", "exact")),
            dtype=dtype,
        )

    def setup(self):
        self.encoder = Encoder(
            image_size=self.img_size,
            latent_channels=self.latent_channels,
            intermediate_channels=self.intermediate_channels,
            num_residual_blocks=self.num_residual_blocks_encoder,
            dropout=self.dropout,
            attention_resolution=self.attention_resolution,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            img_channels=self.img_channels,
            latent_size=self.latent_size,
            intermediate_channels=self.intermediate_channels,
            num_residual_blocks=self.num_residual_blocks_decoder,
            dropout=self.dropout,
            attention_resolution=self.attention_resolution,
            dtype=self.dtype,
        )
        self.codebook = CodeBook(
            num_codebook_vectors=self.num_codebook_vectors,
            latent_dim=self.latent_channels,
            beta=self.beta,
            precision=self.codebook_precision,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                                       param_dtype=jnp.float32, name="post_quant_conv")

    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        """x [B,H,W,C] → (decoded [B,H,W,C], indices [B,h,w], vq loss)."""
        z_q, indices, q_loss = self.encode(x, deterministic=deterministic)
        decoded = self.decode(z_q, deterministic=deterministic)
        return decoded, indices, q_loss

    def encode(self, x: jax.Array, *, deterministic: bool = True):
        h = self.encoder(x, deterministic=deterministic)
        h = self.quant_conv(h)
        z_q, indices, q_loss = self.codebook(h)
        return z_q, indices, q_loss

    def decode(self, z_q: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = self.post_quant_conv(z_q)
        return self.decoder(h, deterministic=deterministic)

    def decode_indices(self, indices: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """Token indices [B, h, w] (or [B, h*w]) → images. Stage-2 z_to_image path
        (reference vqTransformer.py:83-103 — which hardcoded 16×16; we derive the
        grid from ``latent_size``)."""
        b = indices.shape[0]
        grid = self.latent_size
        z_q = self.codebook.lookup(indices.reshape(b, grid, grid))
        return self.decode(z_q, deterministic=deterministic)


def adopt_weight(disc_factor: float, step: jax.Array, threshold: int,
                 value: float = 0.0) -> jax.Array:
    """Discriminator warm-up gate (reference vqvae.py:182-204), traced-friendly."""
    return jnp.where(step < threshold, value, disc_factor)
