"""DDPM-style convolutional encoder (NHWC).

Parity with reference ``network/common/encoder.py:32-101``:

- channel plan ``intermediate_channels=[128,128,256,256,512]`` with the
  reference's duplicate-first-entry insert (encoder.py:44), giving stages
  [128→128, 128→128, 128→256, 256→256, 256→512] and 4 downsamples
  (256² → 16² latent);
- ``num_residual_blocks`` ResidualBlocks per stage, each followed by a
  NonLocalBlock whenever the *current* spatial size is in
  ``attention_resolution`` (encoder.py:71-72);
- bottleneck: ResBlock → NonLocal → ResBlock → GroupNorm → Swish → 3×3 conv to
  ``latent_channels`` (encoder.py:79-96).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (DownsampleBlock, GroupNorm, NonLocalBlock, ResidualBlock,
                     _conv, swish)


class Encoder(nn.Module):
    image_size: int = 256
    latent_channels: int = 256
    intermediate_channels: Sequence[int] = (128, 128, 256, 256, 512)
    num_residual_blocks: int = 2
    dropout: float = 0.0
    attention_resolution: Sequence[int] = (16,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        # reference inserts a copy of the first entry at index 0 (encoder.py:44)
        channels = [self.intermediate_channels[0], *self.intermediate_channels]
        attn_res = set(self.attention_resolution)

        h = _conv(channels[0], 3, dtype=self.dtype, name="conv_in")(x)
        size = self.image_size
        for n in range(len(channels) - 1):
            for i in range(self.num_residual_blocks):
                h = ResidualBlock(channels[n + 1], self.dropout, dtype=self.dtype,
                                  name=f"stage{n}_res{i}")(h, deterministic=deterministic)
                if size in attn_res:
                    h = NonLocalBlock(dtype=self.dtype, name=f"stage{n}_attn{i}")(h)
            if n != len(channels) - 2:
                h = DownsampleBlock(dtype=self.dtype, name=f"stage{n}_down")(h)
                size //= 2

        c = channels[-1]
        h = ResidualBlock(c, self.dropout, dtype=self.dtype, name="mid_res1")(
            h, deterministic=deterministic)
        h = NonLocalBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResidualBlock(c, self.dropout, dtype=self.dtype, name="mid_res2")(
            h, deterministic=deterministic)
        h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        h = _conv(self.latent_channels, 3, dtype=self.dtype, name="conv_out")(h)
        return h
