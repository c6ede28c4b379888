"""Shared conv building blocks (NHWC, flax.linen).

TPU-native re-design of the reference's ``network/common/blocks.py``:

- layouts are NHWC (XLA's preferred TPU conv layout) instead of NCHW;
- the attention block is expressed as one batched matmul pair so XLA maps it
  onto the MXU;
- GroupNorm statistics are computed in float32 regardless of compute dtype.

Behavioral parity notes (reference file:line):

- ``Swish``            — x·σ(x)                       (blocks.py:12-22)
- ``GroupNorm``        — 32 groups, eps 1e-6, affine  (blocks.py:25-44)
- ``ResidualBlock``    — GN→Swish→3×3 ×2 (+dropout), 1×1 shortcut on channel
  change                                              (blocks.py:47-88)
- ``DownsampleBlock``  — asymmetric (left 0, right 1, top 0, bottom 1) zero pad
  then stride-2 VALID 3×3 conv — the pad asymmetry is reproduced exactly
  (blocks.py:91-113)
- ``UpsampleBlock``    — 2× nearest-neighbour upsample then 3×3 conv
  (blocks.py:116-135)
- ``NonLocalBlock``    — 1×1 q/k/v, softmax over flattened HW, scale C^-0.5.
  NOTE the reference adds the residual to the *normalized* input
  (``x = self.norm(x)`` then ``return x + attention``, blocks.py:165,193);
  we reproduce that quirk for parity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    """32-group GroupNorm with eps 1e-6; stats in f32, output in compute dtype."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        num_groups = 32
        while c % num_groups != 0:  # largest divisor of C that is <= 32
            num_groups -= 1
        return nn.GroupNorm(
            num_groups=num_groups, epsilon=1e-6, use_bias=True, use_scale=True,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


def _conv(features: int, kernel: int, stride: int = 1, padding="SAME", dtype=jnp.float32,
          name: str | None = None) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ResidualBlock(nn.Module):
    """GN→Swish→3×3 conv → GN→Swish→dropout→3×3 conv, plus (1×1) shortcut."""

    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        in_channels = x.shape[-1]
        h = GroupNorm(dtype=self.dtype)(x)
        h = swish(h)
        h = _conv(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(dtype=self.dtype)(h)
        h = swish(h)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        h = _conv(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = _conv(self.out_channels, 1, dtype=self.dtype, name="shortcut")(x)
        return x + h


class DownsampleBlock(nn.Module):
    """Zero-pad (top 0, bottom 1, left 0, right 1) then stride-2 VALID 3×3 conv.

    Matches the reference's ``ConstantPad2d((0,1,0,1))`` + VALID conv exactly
    (blocks.py:91-113); a plain SAME stride-2 conv would shift features by one
    pixel relative to the reference.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        return nn.Conv(
            features=c, kernel_size=(3, 3), strides=(2, 2),
            padding=((0, 1), (0, 1)),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)


class UpsampleBlock(nn.Module):
    """2× nearest-neighbour upsample (exact integer repeat) then 3×3 conv."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(c, 3, dtype=self.dtype, name="conv")(x)


class NonLocalBlock(nn.Module):
    """Single-head self-attention over the flattened H·W grid.

    q/k/v/out are 1×1 convs; scores scaled by C^-0.5; softmax in f32. The
    residual adds to the *normalized* activation, reproducing the reference
    quirk (blocks.py:165,193).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        xn = GroupNorm(dtype=self.dtype)(x)
        q = _conv(c, 1, dtype=self.dtype, name="q")(xn).reshape(b, h * w, c)
        k = _conv(c, 1, dtype=self.dtype, name="k")(xn).reshape(b, h * w, c)
        v = _conv(c, 1, dtype=self.dtype, name="v")(xn).reshape(b, h * w, c)

        scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (c ** -0.5)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = jnp.einsum("bqk,bkc->bqc", weights, v.astype(self.dtype))
        attn = attn.reshape(b, h, w, c)
        attn = _conv(c, 1, dtype=self.dtype, name="proj_out")(attn)
        return xn + attn
