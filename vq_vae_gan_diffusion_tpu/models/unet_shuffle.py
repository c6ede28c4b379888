"""ShuffleNet-v2 style Conv2d U-Net ("Unet3D" in the reference's rank naming).

Parity with reference ``network/vqDiffusion/submodule/unet3d.py``:

- ``ResidualBottleneck``/``ResidualDownsample`` shufflenet units: split/concat
  + depthwise 3×3 + BatchNorm + 1×1 ConvBnSiLu + channel shuffle (:30-72);
- discrete ``nn.Embedding(timesteps, time_dim)`` time embedding (:139) with an
  additive TimeMLP (:74-88);
- encoder: 3×Bottleneck + Bottleneck(out//2) shortcut, TimeMLP, downsample;
  decoder: bilinear ×2 upsample, concat shortcut, bottlenecks (:90-125);
- final 1×1 conv to ``out_channels`` (:151).

Layout NHWC; depthwise convs via ``feature_group_count``; channel shuffle is
the same groups-transpose permutation expressed on the trailing axis.

BatchNorm runs in ``batch_stats``-mutable mode during training (global batch
statistics under jit data parallelism = sync-BN, SURVEY §7 hard-part 6) and
running-average mode inside sampling scans.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    *lead, c = x.shape
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


class ConvBnSiLu(nn.Module):
    out_channels: int
    kernel: int
    stride: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return nn.silu(x)


def _depthwise(c: int, stride: int, dtype, name: str):
    return nn.Conv(c, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
                   feature_group_count=c, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


class ResidualBottleneck(nn.Module):
    """shufflenet_v2 basic unit (reference unet3d.py:30-51)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        c = x.shape[-1]
        x1, x2 = jnp.split(x, 2, axis=-1)
        b1 = _depthwise(c // 2, 1, self.dtype, "b1_dw")(x1)
        b1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=self.dtype, param_dtype=jnp.float32, name="b1_bn")(b1)
        b1 = ConvBnSiLu(self.out_channels // 2, 1, dtype=self.dtype, name="b1_pw")(
            b1, train=train)
        b2 = ConvBnSiLu(c // 2, 1, dtype=self.dtype, name="b2_pw1")(x2, train=train)
        b2 = _depthwise(c // 2, 1, self.dtype, "b2_dw")(b2)
        b2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=self.dtype, param_dtype=jnp.float32, name="b2_bn")(b2)
        b2 = ConvBnSiLu(self.out_channels // 2, 1, dtype=self.dtype, name="b2_pw2")(
            b2, train=train)
        return channel_shuffle(jnp.concatenate([b1, b2], axis=-1))


class ResidualDownsample(nn.Module):
    """shufflenet_v2 spatial-downsample unit (reference unet3d.py:53-72)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        c = x.shape[-1]
        b1 = _depthwise(c, 2, self.dtype, "b1_dw")(x)
        b1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=self.dtype, param_dtype=jnp.float32, name="b1_bn")(b1)
        b1 = ConvBnSiLu(self.out_channels // 2, 1, dtype=self.dtype, name="b1_pw")(
            b1, train=train)
        b2 = ConvBnSiLu(self.out_channels // 2, 1, dtype=self.dtype, name="b2_pw1")(
            x, train=train)
        b2 = _depthwise(self.out_channels // 2, 2, self.dtype, "b2_dw")(b2)
        b2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=self.dtype, param_dtype=jnp.float32, name="b2_bn")(b2)
        b2 = ConvBnSiLu(self.out_channels // 2, 1, dtype=self.dtype, name="b2_pw2")(
            b2, train=train)
        return channel_shuffle(jnp.concatenate([b1, b2], axis=-1))


class TimeMLP(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(t_emb)
        h = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(nn.silu(h))
        return nn.silu(x + h[:, None, None, :])


class EncoderBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb=None, *, train: bool = True):
        c = x.shape[-1]
        for i in range(3):
            x = ResidualBottleneck(c, self.dtype, name=f"bn{i}")(x, train=train)
        shortcut = ResidualBottleneck(self.out_channels // 2, self.dtype,
                                      name="bn3")(x, train=train)
        x = shortcut
        if t_emb is not None:
            x = TimeMLP(self.out_channels, self.out_channels // 2, self.dtype,
                        name="time_mlp")(shortcut, t_emb)
        x = ResidualDownsample(self.out_channels, self.dtype, name="down")(
            x, train=train)
        return x, shortcut


class DecoderBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shortcut, t_emb=None, *, train: bool = True):
        b, h, w, c = x.shape
        # resize directly to the skip's spatial size: equals ×2 bilinear for
        # even sizes and handles odd sizes (e.g. mnist's 7²-token grid) that
        # crash the reference's fixed scale_factor=2 upsample (unet3d.py:115)
        sh, sw = shortcut.shape[1], shortcut.shape[2]
        x = jax.image.resize(x, (b, sh, sw, c), method="bilinear")
        x = jnp.concatenate([x, shortcut], axis=-1)
        c = x.shape[-1]
        for i in range(3):
            x = ResidualBottleneck(c, self.dtype, name=f"bn{i}")(x, train=train)
        x = ResidualBottleneck(c // 2, self.dtype, name="bn3")(x, train=train)
        if t_emb is not None:
            x = TimeMLP(c, c // 2, self.dtype, name="time_mlp")(x, t_emb)
        return ResidualBottleneck(self.out_channels // 2, self.dtype,
                                  name="bn4")(x, train=train)


class ShuffleUNet(nn.Module):
    """Reference Unet3D: simple shufflenet U-Net without attention."""

    timesteps: int
    time_embedding_dim: int = 256
    in_channels: int = 3
    out_channels: int = 2
    base_dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_self_cond=None,
                 t: Optional[jax.Array] = None, *, train: bool = True) -> jax.Array:
        dims = [self.base_dim] + [self.base_dim * m for m in self.dim_mults]
        channels = list(zip(dims[:-1], dims[1:]))

        x = ConvBnSiLu(self.base_dim, 3, 1, 1, self.dtype, name="init_conv")(
            x, train=train)
        t_emb = None
        if t is not None:
            t_emb = nn.Embed(self.timesteps, self.time_embedding_dim,
                             param_dtype=jnp.float32, dtype=self.dtype,
                             name="time_embedding")(t)

        shortcuts = []
        for i, (cin, cout) in enumerate(channels):
            x, sc = EncoderBlock(cout, self.dtype, name=f"enc{i}")(
                x, t_emb, train=train)
            shortcuts.append(sc)

        mid = channels[-1][1]
        for i in range(2):
            x = ResidualBottleneck(mid, self.dtype, name=f"mid{i}")(x, train=train)
        x = ResidualBottleneck(mid // 2, self.dtype, name="mid2")(x, train=train)

        for i, (cin, cout) in enumerate(reversed(channels)):
            x = DecoderBlock(cin, self.dtype, name=f"dec{i}")(
                x, shortcuts[-(i + 1)], t_emb, train=train)

        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="final_conv")(x)


# reference naming alias ("3D" = rank of [B, C, H, W] input)
Unet3D = ShuffleUNet
