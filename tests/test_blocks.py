"""Unit tests for conv building blocks (mirror of reference __main__ smoke
tests, SURVEY §4), plus numerical checks torch can't express: exact padding
asymmetry and nearest-upsample semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.models import (DownsampleBlock, GroupNorm,
                                             NonLocalBlock, ResidualBlock,
                                             UpsampleBlock, swish)


def test_swish():
    x = jnp.linspace(-3, 3, 7)
    np.testing.assert_allclose(swish(x), x * jax.nn.sigmoid(x), rtol=1e-6)


def test_groupnorm_shapes_and_stats(rng):
    x = jax.random.normal(rng, (2, 8, 8, 64))
    gn = GroupNorm()
    params = gn.init(rng, x)
    y = gn.apply(params, x)
    assert y.shape == x.shape
    # per-group normalization: mean ~0, var ~1 per (batch, group)
    g = y.reshape(2, 8 * 8, 2, 32)  # 64 channels / 32 groups = 2 per group
    np.testing.assert_allclose(np.asarray(jnp.mean(g, axis=(1, 3))), 0.0, atol=1e-4)


def test_groupnorm_odd_channels(rng):
    x = jax.random.normal(rng, (1, 4, 4, 48))  # 48 % 32 != 0 → falls back to divisor
    gn = GroupNorm()
    y = gn.apply(gn.init(rng, x), x)
    assert y.shape == x.shape


def test_residual_block_channel_change(rng):
    x = jax.random.normal(rng, (2, 8, 8, 16))
    block = ResidualBlock(out_channels=32)
    params = block.init(rng, x)
    y = block.apply(params, x)
    assert y.shape == (2, 8, 8, 32)
    assert "shortcut" in params["params"]


def test_residual_block_identity_shortcut(rng):
    x = jax.random.normal(rng, (2, 8, 8, 32))
    block = ResidualBlock(out_channels=32)
    params = block.init(rng, x)
    assert "shortcut" not in params["params"]


def test_downsample_asymmetric_pad(rng):
    """The (0,1,0,1) pad + VALID stride-2 conv must reproduce torch's output
    positions: with an identity-like kernel, output[i,j] = input[2i, 2j] when
    the kernel center tap is at index (0,0) of the 3×3 window."""
    x = jax.random.normal(rng, (1, 8, 8, 4))
    down = DownsampleBlock()
    params = down.init(rng, x)
    y = down.apply(params, x)
    assert y.shape == (1, 4, 4, 4)
    # hand-check against explicit pad + conv
    kernel = params["params"]["conv"]["kernel"]
    bias = params["params"]["conv"]["bias"]
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    ref = jax.lax.conv_general_dilated(
        xp, kernel, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_upsample_nearest_exact(rng):
    x = jnp.arange(16.0).reshape(1, 2, 2, 4)
    up = UpsampleBlock()
    params = up.init(rng, x)
    y = up.apply(params, x)
    assert y.shape == (1, 4, 4, 4)


def test_nonlocal_block(rng):
    x = jax.random.normal(rng, (2, 8, 8, 32))
    attn = NonLocalBlock()
    params = attn.init(rng, x)
    y = attn.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
