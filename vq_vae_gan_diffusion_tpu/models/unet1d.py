"""Conv1d U-Net over sequences ("Unet2D" in the reference's rank-based naming).

Parity with reference ``network/vqDiffusion/submodule/unet2d.py`` (and its
near-duplicate ``network/diffusion/unet_2d.py`` which adds a ``condition``
input instead of self-conditioning — this module supports both):

- RMSNorm over channels (:60-66), sinusoidal or learned-random time embeddings
  (:80-110), time MLP dim·4;
- ResnetBlock with FiLM scale-shift ``x·(scale+1)+shift`` (:133-157);
- LinearAttention (softmax-kernel: softmax(q) over channels, softmax(k) over
  positions) in every stage, full Attention at the bottleneck (:159-210);
- 4-stage down/up with double skip-concat per stage (:276-305), stride-2
  kernel-4 downsample, nearest-×2 upsample;
- init 7-wide conv, residual-to-input concat before the final block.

Layout here is [B, N, C] (length-minor channels-last — TPU native); the
reference uses [B, C, N].
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def conv1d(features: int, kernel: int, stride: int = 1, padding="SAME",
           use_bias: bool = True, dtype=jnp.float32, name: Optional[str] = None):
    return nn.Conv(features, (kernel,), strides=(stride,), padding=padding,
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32, name=name)


class RMSNorm(nn.Module):
    """F.normalize over channels · g · √C (reference unet2d.py:60-66)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (c,))
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.sum(x32 * x32, -1, keepdims=True) + 1e-12)
        return (normed * g * math.sqrt(c)).astype(x.dtype)


class SinusoidalPosEmb(nn.Module):
    dim: int
    theta: float = 10000.0

    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half) * (-math.log(self.theta) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        freqs = t.astype(jnp.float32)[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate([t[:, None].astype(jnp.float32),
                                jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class ConvBlock(nn.Module):
    dim_out: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple] = None, *,
                 deterministic: bool = True):
        x = conv1d(self.dim_out, 3, dtype=self.dtype, name="proj")(x)
        x = RMSNorm(dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ResnetBlock(nn.Module):
    dim_out: int
    time_emb: bool = True
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb=None, *, deterministic: bool = True):
        scale_shift = None
        if self.time_emb and t_emb is not None:
            h = nn.Dense(self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32,
                         name="time_proj")(nn.silu(t_emb))
            h = h[:, None, :]  # [B, 1, 2C] broadcasting over length
            scale_shift = jnp.split(h, 2, axis=-1)
        h = ConvBlock(self.dim_out, self.dropout, self.dtype, name="block1")(
            x, scale_shift, deterministic=deterministic)
        h = ConvBlock(self.dim_out, 0.0, self.dtype, name="block2")(
            h, deterministic=deterministic)
        if x.shape[-1] != self.dim_out:
            x = conv1d(self.dim_out, 1, dtype=self.dtype, name="res_conv")(x)
        return h + x


class LinearAttention1D(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = conv1d(hidden * 3, 1, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        q, k, v = map(reshape, (q, k, v))
        # softmax(q) over feature dim, softmax(k) over positions
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(self.dtype)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
        q = q * (self.dim_head ** -0.5)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q).reshape(b, n, hidden)
        out = conv1d(c, 1, dtype=self.dtype, name="to_out")(out)
        return RMSNorm(dtype=self.dtype, name="out_norm")(out)


class Attention1D(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = conv1d(hidden * 3, 1, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        q, k, v = map(reshape, (q, k, v))
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, hidden)
        return conv1d(c, 1, dtype=self.dtype, name="to_out")(out)


class PreNormResidual(nn.Module):
    inner: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return self.inner(RMSNorm(dtype=self.dtype)(x)) + x


class Unet1D(nn.Module):
    """lucidrains-style 1D denoiser. Input [B, N, C] → output [B, N, out_dim]."""

    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    dropout: float = 0.0
    self_condition: bool = False
    condition: bool = False          # unet_2d.py flavor: extra conditioning input
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    attn_dim_head: int = 32
    attn_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_self_cond: Optional[jax.Array] = None,
                 time: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        if self.self_condition or self.condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = self.init_dim or self.dim
        x = conv1d(init_dim, 7, dtype=self.dtype, name="init_conv")(x)
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
        n_res = len(in_out)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ResnetBlock(dim_in, dropout=self.dropout, dtype=self.dtype,
                            name=f"down{ind}_res1")(x, t, deterministic=deterministic)
            hs.append(x)
            x = ResnetBlock(dim_in, dropout=self.dropout, dtype=self.dtype,
                            name=f"down{ind}_res2")(x, t, deterministic=deterministic)
            x = PreNormResidual(LinearAttention1D(self.attn_heads, self.attn_dim_head,
                                                  self.dtype), self.dtype,
                                name=f"down{ind}_attn")(x)
            hs.append(x)
            if not is_last:
                x = conv1d(dim_out, 4, stride=2, padding=((1, 1),), dtype=self.dtype,
                           name=f"down{ind}_down")(x)
            else:
                x = conv1d(dim_out, 3, dtype=self.dtype, name=f"down{ind}_down")(x)

        mid = dims[-1]
        x = ResnetBlock(mid, dropout=self.dropout, dtype=self.dtype,
                        name="mid_res1")(x, t, deterministic=deterministic)
        x = PreNormResidual(Attention1D(self.attn_heads, self.attn_dim_head,
                                        self.dtype), self.dtype, name="mid_attn")(x)
        x = ResnetBlock(mid, dropout=self.dropout, dtype=self.dtype,
                        name="mid_res2")(x, t, deterministic=deterministic)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == n_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, dropout=self.dropout, dtype=self.dtype,
                            name=f"up{ind}_res1")(x, t, deterministic=deterministic)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, dropout=self.dropout, dtype=self.dtype,
                            name=f"up{ind}_res2")(x, t, deterministic=deterministic)
            x = PreNormResidual(LinearAttention1D(self.attn_heads, self.attn_dim_head,
                                                  self.dtype), self.dtype,
                                name=f"up{ind}_attn")(x)
            if not is_last:
                x = jnp.repeat(x, 2, axis=1)
                x = conv1d(dim_in, 3, dtype=self.dtype, name=f"up{ind}_up")(x)
            else:
                x = conv1d(dim_in, 3, dtype=self.dtype, name=f"up{ind}_up")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(init_dim, dropout=self.dropout, dtype=self.dtype,
                        name="final_res")(x, t, deterministic=deterministic)
        out_dim = self.out_dim or self.channels * (2 if self.learned_variance else 1)
        return conv1d(out_dim, 1, dtype=self.dtype, name="final_conv")(x)


# reference naming alias ("2D" = rank of [B, C, N] input)
Unet2D = Unet1D
