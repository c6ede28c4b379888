"""Tests for the remaining model families: continuous c_/v_ VQ-diffusion and
the transformer-predictor VQ-Diffusion (reference network/continous_vq_diffusion/,
network/vq_diffusion/, root vq_diffusion.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.diffusion.discrete import LtState


@pytest.fixture(scope="module")
def small_cfg(tiny_config):
    return tiny_config.replace_path("architecture.model_name", "vqdiffusion")


def _vq_params(model, rng):
    x = jax.random.normal(rng, (2, 32, 32, 3))
    return model.init(rng, x)["params"], x


def test_v_vq_diffusion(small_cfg, rng):
    from vq_vae_gan_diffusion_tpu.models.continuous_vq import V_VQDiffusion
    m = V_VQDiffusion(small_cfg)
    vq_params, x = _vq_params(m.vqvae, rng)
    t0 = jnp.zeros((1,), jnp.int32)
    dummy = jnp.zeros((1, m.seq_length, m.embedding_dim), jnp.float32)
    unet_params = m.unet.init(rng, dummy, None, t0)["params"]
    loss = m.loss(unet_params, vq_params, x, rng)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: m.loss(p, vq_params, x, rng))(unet_params)
    assert max(float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)) > 0
    m.sampling_timesteps = 4
    idx = m.sample(unet_params, vq_params, rng, batch_size=2)
    assert idx.shape == (2, m.seq_length)
    assert int(idx.max()) < m.codebook_size


def test_c_vq_diffusion(small_cfg, rng):
    from vq_vae_gan_diffusion_tpu.models.continuous_vq import C_VQDiffusion
    m = C_VQDiffusion(small_cfg)
    vq_params, x = _vq_params(m.vqvae, rng)
    t0 = jnp.zeros((1,), jnp.int32)
    dummy = jnp.zeros((1, m.seq_length, m.indices_width), jnp.float32)
    unet_params = m.unet.init(rng, dummy, None, t0)["params"]
    loss = m.loss(unet_params, vq_params, x, rng)
    assert np.isfinite(float(loss))
    m.sampling_timesteps = 4
    idx = m.sample(unet_params, vq_params, rng, batch_size=2)
    assert idx.shape == (2, m.seq_length)
    assert idx.dtype == jnp.int32
    assert 0 <= int(idx.min()) and int(idx.max()) < m.codebook_size


def test_transformer_vq_diffusion(rng):
    from vq_vae_gan_diffusion_tpu.models.transformer_vq_diffusion import \
        TransformerVQDiffusion
    m = TransformerVQDiffusion(codebook_size=32, seq_len=16, diffusion_steps=6,
                               embedding_dim=32, num_layers=2, num_heads=4)
    idx0 = jax.random.randint(rng, (2, 16), 0, 32)
    dummy_t = jnp.zeros((2,), jnp.int32)
    params = m.predictor.init(rng, idx0, dummy_t)["params"]
    lt = LtState.init(6)
    loss, metrics, new_lt = m.loss(params, idx0, rng, lt)
    assert np.isfinite(float(loss))

    g = jax.grad(lambda p: m.loss(p, idx0, rng, lt)[0])(params)
    assert max(float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)) > 0

    samples = m.sample(params, rng, 2)
    assert samples.shape == (2, 4, 4)
    assert int(samples.max()) < 32  # mask token excluded

    fast = m.fast_sample(params, rng, 2, skip_step=2)
    assert fast.shape == (2, 4, 4)
    assert int(fast.max()) < 32
