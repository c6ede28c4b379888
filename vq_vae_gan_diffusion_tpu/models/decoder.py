"""Mirror convolutional decoder (NHWC).

Parity with reference ``network/common/decoder.py:35-104``:

- reversed channel plan [512,256,256,128,128];
- initial 3×3 conv from latent, then ResBlock → NonLocal → ResBlock bottleneck
  (decoder.py:52-70);
- 5 stages of ``num_residual_blocks`` ResidualBlocks, each followed by a
  NonLocalBlock while the current spatial size is in ``attention_resolution``
  (stages 0 and 1 for latent 16); upsample at the end of every stage except the
  first (decoder.py:73-88) — 4 upsamples, 16² → 256²;
- tail: GroupNorm → Swish → 3×3 conv to image channels (decoder.py:91-99).

The final conv kernel (``conv_out``) is the anchor parameter for VQGAN's
adaptive-λ computation (reference vqvae.py:163-164); see
:func:`..train.vqgan_worker.make_train_step`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (GroupNorm, NonLocalBlock, ResidualBlock, UpsampleBlock,
                     _conv, swish)


class Decoder(nn.Module):
    img_channels: int = 3
    latent_size: int = 16
    intermediate_channels: Sequence[int] = (128, 128, 256, 256, 512)
    num_residual_blocks: int = 3
    dropout: float = 0.0
    attention_resolution: Sequence[int] = (16,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        channels = list(self.intermediate_channels)[::-1]
        attn_res = set(self.attention_resolution)

        h = _conv(channels[0], 3, dtype=self.dtype, name="conv_in")(z)
        h = ResidualBlock(channels[0], self.dropout, dtype=self.dtype, name="mid_res1")(
            h, deterministic=deterministic)
        h = NonLocalBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResidualBlock(channels[0], self.dropout, dtype=self.dtype, name="mid_res2")(
            h, deterministic=deterministic)

        size = self.latent_size
        for n in range(len(channels)):
            for i in range(self.num_residual_blocks):
                h = ResidualBlock(channels[n], self.dropout, dtype=self.dtype,
                                  name=f"stage{n}_res{i}")(h, deterministic=deterministic)
                if size in attn_res:
                    h = NonLocalBlock(dtype=self.dtype, name=f"stage{n}_attn{i}")(h)
            if n != 0:
                h = UpsampleBlock(dtype=self.dtype, name=f"stage{n}_up")(h)
                size *= 2

        h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        h = _conv(self.img_channels, 3, dtype=self.dtype, name="conv_out")(h)
        return h
