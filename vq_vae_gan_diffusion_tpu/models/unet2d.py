"""lucidrains-style Conv2d DDPM U-Net ("Unet3D" in ``network/diffusion/unet_3d.py``).

Parity notes (reference file:line):

- space-to-depth downsample (2×2 patches → channels → 1×1 conv, :97-101) and
  nearest-×2 upsample + 3×3 conv (:91-95);
- RMSNorm over channels (:103-110);
- LinearAttention/Attention with ``num_mem_kv`` learned memory KV slots
  prepended (:193-272); full attention only at the innermost stage + bottleneck
  by default (:330-331);
- double skip-concat per stage, residual-to-input concat before the final
  block (:395-431);
- the reference imports a flash ``Attend`` helper (:31) — on TPU, XLA fuses the
  attention einsums natively, so plain softmax attention is the fast path at
  these resolutions.

Also provides ``SimpleUNet`` — the minimal DoubleConv/MaxPool/ConvTranspose
U-Net of ``network/diffusion/unet_3d_v2.py:59-105``.

Layout NHWC; input [B, H, W, C].
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet1d import RandomOrLearnedSinusoidalPosEmb, SinusoidalPosEmb

Dtype = Any


def conv2d(features: int, kernel: int, stride: int = 1, padding="SAME",
           use_bias: bool = True, dtype=jnp.float32, name: Optional[str] = None):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, use_bias=use_bias, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class RMSNorm2D(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (c,))
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.sum(x32 * x32, -1, keepdims=True) + 1e-12)
        return (normed * g * (c ** 0.5)).astype(x.dtype)


def space_to_depth(x: jax.Array) -> jax.Array:
    """b (h 2) (w 2) c → b h w (c·4), matching the reference Rearrange order
    'b c (h p1) (w p2) -> b (c p1 p2) h w' expressed channels-last."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # b h w c p1 p2
    return x.reshape(b, h // 2, w // 2, c * 4)


class ConvBlock2D(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None, *, deterministic: bool = True):
        x = conv2d(self.dim_out, 3, dtype=self.dtype, name="proj")(x)
        x = RMSNorm2D(dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ResnetBlock2D(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb=None, *, deterministic: bool = True):
        scale_shift = None
        if t_emb is not None:
            h = nn.Dense(self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32,
                         name="time_proj")(nn.silu(t_emb))
            h = h[:, None, None, :]
            scale_shift = jnp.split(h, 2, axis=-1)
        h = ConvBlock2D(self.dim_out, self.dropout, self.dtype, name="block1")(
            x, scale_shift, deterministic=deterministic)
        h = ConvBlock2D(self.dim_out, 0.0, self.dtype, name="block2")(
            h, deterministic=deterministic)
        if x.shape[-1] != self.dim_out:
            x = conv2d(self.dim_out, 1, dtype=self.dtype, name="res_conv")(x)
        return h + x


class LinearAttention2D(nn.Module):
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        xn = RMSNorm2D(dtype=self.dtype, name="norm")(x)
        qkv = conv2d(hidden * 3, 1, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(xn).reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        mem = self.param("mem_kv", nn.initializers.normal(1.0),
                         (2, self.heads, self.num_mem_kv, self.dim_head))
        mk = jnp.broadcast_to(mem[0].transpose(1, 0, 2)[None],
                              (b, self.num_mem_kv, self.heads, self.dim_head))
        mv = jnp.broadcast_to(mem[1].transpose(1, 0, 2)[None],
                              (b, self.num_mem_kv, self.heads, self.dim_head))
        k = jnp.concatenate([mk.astype(k.dtype), k], axis=1)
        v = jnp.concatenate([mv.astype(v.dtype), v], axis=1)
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(self.dtype)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
        q = q * (self.dim_head ** -0.5)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q).reshape(b, h, w, hidden)
        out = conv2d(c, 1, dtype=self.dtype, name="to_out")(out)
        return RMSNorm2D(dtype=self.dtype, name="out_norm")(out)


class Attention2D(nn.Module):
    heads: int = 4
    dim_head: int = 32
    num_mem_kv: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        hidden = self.heads * self.dim_head
        xn = RMSNorm2D(dtype=self.dtype, name="norm")(x)
        qkv = conv2d(hidden * 3, 1, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(xn).reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        mem = self.param("mem_kv", nn.initializers.normal(1.0),
                         (2, self.heads, self.num_mem_kv, self.dim_head))
        mk = jnp.broadcast_to(jnp.swapaxes(mem[0], 0, 1)[None],
                              (b, self.num_mem_kv, self.heads, self.dim_head))
        mv = jnp.broadcast_to(jnp.swapaxes(mem[1], 0, 1)[None],
                              (b, self.num_mem_kv, self.heads, self.dim_head))
        k = jnp.concatenate([mk.astype(k.dtype), k], axis=1)
        v = jnp.concatenate([mv.astype(v.dtype), v], axis=1)
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, h, w, hidden)
        return conv2d(c, 1, dtype=self.dtype, name="to_out")(out)


class Unet2DPixel(nn.Module):
    """lucidrains DDPM U-Net for pixel-space diffusion (reference unet_3d.py)."""

    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    dropout: float = 0.0
    attn_dim_head: int = 32
    attn_heads: int = 4
    full_attn: Optional[Tuple[bool, ...]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_self_cond=None,
                 time: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = self.init_dim or self.dim
        x = conv2d(init_dim, 7, dtype=self.dtype, name="init_conv")(x)
        r = x

        time_dim = self.dim * 4
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features,
                name="sinu")(time)
        else:
            emb = SinusoidalPosEmb(self.dim)(time)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_fc1")(emb.astype(self.dtype))
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_fc2")(nn.gelu(t, approximate=False))

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_stage = len(in_out)
        full_attn = self.full_attn or tuple([False] * (n_stage - 1) + [True])

        def attn(dim_key, use_full, name):
            klass = Attention2D if use_full else LinearAttention2D
            return klass(self.attn_heads, self.attn_dim_head, dtype=self.dtype,
                         name=name)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_stage - 1
            x = ResnetBlock2D(dim_in, self.dropout, self.dtype,
                              name=f"down{ind}_res1")(x, t, deterministic=deterministic)
            hs.append(x)
            x = ResnetBlock2D(dim_in, self.dropout, self.dtype,
                              name=f"down{ind}_res2")(x, t, deterministic=deterministic)
            x = attn(dim_in, full_attn[ind], f"down{ind}_attn")(x) + x
            hs.append(x)
            if not is_last:
                x = space_to_depth(x)
                x = conv2d(dim_out, 1, dtype=self.dtype, name=f"down{ind}_down")(x)
            else:
                x = conv2d(dim_out, 3, dtype=self.dtype, name=f"down{ind}_down")(x)

        mid = dims[-1]
        x = ResnetBlock2D(mid, self.dropout, self.dtype, name="mid_res1")(
            x, t, deterministic=deterministic)
        x = Attention2D(self.attn_heads, self.attn_dim_head, dtype=self.dtype,
                        name="mid_attn")(x) + x
        x = ResnetBlock2D(mid, self.dropout, self.dtype, name="mid_res2")(
            x, t, deterministic=deterministic)

        for ind, ((dim_in, dim_out), use_full) in enumerate(
                zip(reversed(in_out), reversed(full_attn))):
            is_last = ind == n_stage - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock2D(dim_out, self.dropout, self.dtype,
                              name=f"up{ind}_res1")(x, t, deterministic=deterministic)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock2D(dim_out, self.dropout, self.dtype,
                              name=f"up{ind}_res2")(x, t, deterministic=deterministic)
            x = attn(dim_out, use_full, f"up{ind}_attn")(x) + x
            if not is_last:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = conv2d(dim_in, 3, dtype=self.dtype, name=f"up{ind}_up")(x)
            else:
                x = conv2d(dim_in, 3, dtype=self.dtype, name=f"up{ind}_up")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock2D(init_dim, self.dropout, self.dtype, name="final_res")(
            x, t, deterministic=deterministic)
        out_dim = self.out_dim or self.channels * (2 if self.learned_variance else 1)
        return conv2d(out_dim, 1, dtype=self.dtype, name="final_conv")(x)


class SimpleUNet(nn.Module):
    """Minimal classic U-Net + time MLP (reference unet_3d_v2.py:59-105)."""

    in_channels: int = 3
    out_channels: int = 3
    time_dim: int = 32
    features: Sequence[int] = (64, 128, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_self_cond=None,
                 time: Optional[jax.Array] = None) -> jax.Array:
        t = SinusoidalPosEmb(self.time_dim)(time)
        t = nn.Dense(self.time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_fc")(t.astype(self.dtype))
        t = nn.relu(t)

        def double_conv(h, feats, name):
            h = conv2d(feats, 3, dtype=self.dtype, name=f"{name}_c1")(h)
            h = nn.relu(h)
            h = conv2d(feats, 3, dtype=self.dtype, name=f"{name}_c2")(h)
            return nn.relu(h)

        skips = []
        for i, f in enumerate(self.features):
            x = double_conv(x, f, f"down{i}")
            x = x + nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"time_to_{i}")(t)[:, None, None, :]
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = double_conv(x, self.features[-1] * 2, "bottleneck")

        for i, f in enumerate(reversed(self.features)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"up{i}_t")(x)
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = double_conv(x, f, f"up{i}")

        return conv2d(self.out_channels, 1, dtype=self.dtype, name="out")(x)
