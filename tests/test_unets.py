"""Denoiser U-Net shape/finite tests (mirror reference __main__ smoke tests:
unet2d.py:359-377, unet3d.py:175-180, diffusion/unet_3d.py:435-458,
unet_3d_v2.py:107-112)."""

import jax
import jax.numpy as jnp
import numpy as np

from vq_vae_gan_diffusion_tpu.models.unet1d import Unet1D
from vq_vae_gan_diffusion_tpu.models.unet2d import SimpleUNet, Unet2DPixel
from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet, channel_shuffle


def test_unet1d_shapes(rng):
    model = Unet1D(dim=16, dim_mults=(1, 2), channels=1)
    x = jax.random.normal(rng, (2, 16, 1))  # [B, N, C]
    t = jnp.array([3, 7])
    params = model.init(rng, x, None, t)
    out = model.apply(params, x, None, t)
    assert out.shape == (2, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_unet1d_self_condition(rng):
    model = Unet1D(dim=16, dim_mults=(1, 2), channels=2, self_condition=True)
    x = jax.random.normal(rng, (2, 16, 2))
    t = jnp.array([0, 1])
    params = model.init(rng, x, None, t)
    out = model.apply(params, x, x, t)
    assert out.shape == (2, 16, 2)


def test_unet1d_out_dim_override(rng):
    model = Unet1D(dim=16, dim_mults=(1, 2), channels=16, out_dim=15)
    x = jax.random.normal(rng, (2, 32, 16))
    t = jnp.array([1, 2])
    params = model.init(rng, x, None, t)
    assert model.apply(params, x, None, t).shape == (2, 32, 15)


def test_channel_shuffle_permutation():
    x = jnp.arange(8.0).reshape(1, 1, 1, 8)
    y = channel_shuffle(x, groups=2)
    # [0..3 | 4..7] → interleave: 0,4,1,5,2,6,3,7
    np.testing.assert_array_equal(np.asarray(y).ravel(),
                                  [0, 4, 1, 5, 2, 6, 3, 7])


def test_shuffle_unet_shapes(rng):
    model = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=3,
                        out_channels=3, base_dim=16, dim_mults=(2, 4))
    x = jax.random.normal(rng, (2, 32, 32, 3))
    t = jnp.array([1, 9])
    variables = model.init(rng, x, None, t, train=False)
    out = model.apply(variables, x, None, t, train=False)
    assert out.shape == (2, 32, 32, 3)
    # train mode updates batch stats
    out2, upd = model.apply(variables, x, None, t, train=True,
                            mutable=["batch_stats"])
    assert "batch_stats" in upd


def test_unet2d_pixel_shapes(rng):
    model = Unet2DPixel(dim=16, dim_mults=(1, 2), channels=3)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    t = jnp.array([1, 5])
    params = model.init(rng, x, None, t)
    out = model.apply(params, x, None, t)
    assert out.shape == (2, 16, 16, 3)


def test_simple_unet_shapes(rng):
    model = SimpleUNet(in_channels=1, out_channels=1, features=(8, 16))
    x = jax.random.normal(rng, (2, 16, 16, 1))
    t = jnp.array([1, 5])
    params = model.init(rng, x, None, t)
    out = model.apply(params, x, None, t)
    assert out.shape == (2, 16, 16, 1)


def test_shuffle_unet_odd_sizes(rng):
    """Odd spatial sizes (mnist's 7²-token grid) must round-trip; the
    reference's fixed ×2 upsample crashes here (unet3d.py:115)."""
    model = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                        out_channels=1, base_dim=16, dim_mults=(1, 2, 4, 8))
    x = jax.random.normal(rng, (2, 49, 96, 1))
    t = jnp.array([1, 9])
    variables = model.init(rng, x, None, t, train=False)
    out = model.apply(variables, x, None, t, train=False)
    assert out.shape == (2, 49, 96, 1)
