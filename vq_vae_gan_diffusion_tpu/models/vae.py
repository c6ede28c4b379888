"""Plain VAE: shared Encoder/Decoder with µ / logσ² heads.

Parity with reference ``network/vae/vae.py:12-81``: 1×1-conv ``fc_mu`` /
``fc_logvar`` heads over the encoder output, reparameterization
``z = µ + ε·exp(½ logσ²)``, decode through the shared Decoder. Defaults match
the reference's ``.get`` fallbacks (attention at resolution 32 by default,
vae.py:21).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config, resolve_img_channels, resolve_img_size
from .decoder import Decoder
from .encoder import Encoder


class VAE(nn.Module):
    img_size: int = 256
    img_channels: int = 3
    latent_channels: int = 256
    latent_size: int = 16
    intermediate_channels: Tuple[int, ...] = (128, 128, 256, 256, 512)
    num_residual_blocks_encoder: int = 2
    num_residual_blocks_decoder: int = 3
    dropout: float = 0.0
    attention_resolution: Tuple[int, ...] = (32,)
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: Config, dtype=jnp.float32) -> "VAE":
        vae = cfg.architecture.get("vae", cfg.architecture.get("vqvae"))
        return cls(
            img_size=resolve_img_size(cfg),
            img_channels=resolve_img_channels(cfg),
            latent_channels=int(vae.get("latent_channels", 256)),
            latent_size=int(vae.get("latent_size", 16)),
            intermediate_channels=tuple(vae.get("intermediate_channels", (128, 128, 256, 256, 512))),
            num_residual_blocks_encoder=int(vae.get("num_residual_blocks_encoder", 2)),
            num_residual_blocks_decoder=int(vae.get("num_residual_blocks_decoder", 3)),
            dropout=float(vae.get("dropout", 0.0)),
            attention_resolution=tuple(vae.get("attention_resolution", (32,))),
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
        self.fc_mu = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc_mu")
        self.fc_logvar = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                                 param_dtype=jnp.float32, name="fc_logvar")

    def __call__(self, x: jax.Array, rng: jax.Array, *, deterministic: bool = True):
        mu, logvar = self.encode(x, deterministic=deterministic)
        z = self.reparameterize(rng, mu, logvar)
        decoded = self.decode(z, deterministic=deterministic)
        return decoded, mu, logvar

    def encode(self, x: jax.Array, *, deterministic: bool = True):
        h = self.encoder(x, deterministic=deterministic)
        return self.fc_mu(h), self.fc_logvar(h)

    @staticmethod
    def reparameterize(rng: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        eps = jax.random.normal(rng, std.shape, jnp.float32)
        return (mu.astype(jnp.float32) + eps * std).astype(mu.dtype)

    def decode(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        return self.decoder(z, deterministic=deterministic)
