"""Worker smoke tests: one jitted train step + sampling per model family on
the tiny config (the rebuild's analogue of the reference's --debug integration
runs, SURVEY §4)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _run_dir():
    return tempfile.mkdtemp(prefix="vqgd_test_")


def _batch(rng, n=4, size=32, ch=3):
    return jnp.asarray(jax.random.normal(rng, (n, size, size, ch)))


def test_vqvae_worker_step(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    w = VQGANVQVAEWorker(tiny_config, _run_dir(), debug=True)
    w.state = w.init_state()
    s1, m1 = w.train_step(w.state, _batch(rng), rng)
    s2, m2 = w.train_step(s1, _batch(rng), rng)
    assert np.isfinite(m2["vq_loss"])
    assert float(m1["gan_loss"]) == 0.0  # vqvae mode has no GAN


def test_vqgan_worker_step_and_warmup(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    cfg = tiny_config.replace_path("architecture.model_name", "vqgan")
    w = VQGANVQVAEWorker(cfg, _run_dir(), debug=True)
    w.state = w.init_state()
    s1, m1 = w.train_step(w.state, _batch(rng), rng)
    assert float(m1["disc_factor"]) == 0.0  # before disc_start=2
    s2, m2 = w.train_step(s1, _batch(rng), rng)
    s3, m3 = w.train_step(s2, _batch(rng), rng)
    assert float(m3["disc_factor"]) == 1.0
    assert np.isfinite(m3["gan_loss"])
    assert float(m3["lambda"]) >= 0.0


def test_vqgan_worker_remat_matches(tiny_config, rng):
    """architecture.vqvae.remat must be semantics-preserving.

    Forward metrics from the same state must agree to float noise, and the
    VQVAE gradients under ``jax.checkpoint`` must match the plain backward to
    reassociation tolerance.  Post-Adam params are deliberately NOT compared:
    Adam's first step is ~lr·sign(g), so a 1e-6 reassociation wiggle on a
    near-zero gradient flips the whole update — that is optimizer
    amplification, not a remat bug.
    """
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    cfg = tiny_config.replace_path("architecture.model_name", "vqgan")
    w0 = VQGANVQVAEWorker(cfg, _run_dir(), debug=True)
    w1 = VQGANVQVAEWorker(cfg.replace_path("architecture.vqvae.remat", True),
                          _run_dir(), debug=True)
    state = w0.init_state()
    x = _batch(rng)
    _, m0 = w0.train_step(state, x, rng)
    _, m1 = w1.train_step(state, x, rng)
    for k in ("vq_loss", "q_loss", "perceptual_rec_loss", "lambda"):
        np.testing.assert_allclose(float(m1[k]), float(m0[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)

    # Gradient-level check: same loss, plain vs checkpointed forward.
    model = w0.model
    params = state.vqvae_params

    def mk_loss(fwd):
        def loss(p):
            decoded, _, q_loss = fwd(p, x)
            return jnp.mean(jnp.square(decoded - x)) + q_loss
        return loss

    plain = lambda p, a: model.apply({"params": p}, a)  # noqa: E731
    g0 = jax.jit(jax.grad(mk_loss(plain)))(params)
    g1 = jax.jit(jax.grad(mk_loss(jax.checkpoint(plain))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), float(np.max(np.abs(b))))
        if scale < 1e-4:
            continue  # gradient-dead leaf: both sides are pure float noise
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-4 * scale)


def test_vae_worker_step_and_sample(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.vae_worker import VAEWorker
    cfg = tiny_config.replace_path("architecture.model_name", "vae")
    w = VAEWorker(cfg, _run_dir(), debug=True)
    w.state = w.init_state()
    s1, m1 = w.train_step(w.state, _batch(rng), rng)
    assert np.isfinite(m1["vae_loss"])
    samples = w.sample(2, rng)
    assert samples.shape == (2, 32, 32, 3)


def test_transformer_worker_step_and_sample(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.vq_transformer_worker import \
        VQTransformerWorker
    cfg = tiny_config.replace_path("architecture.model_name", "vqvae_transformer")
    w = VQTransformerWorker(cfg, _run_dir(), debug=True)
    w.state = w.init_state()
    s1, m1 = w.train_step(w.state, _batch(rng), rng)
    assert np.isfinite(m1["ce_loss"])
    # loss decreases over a few steps on a repeated batch
    b = _batch(rng)
    s, prev = w.state, None
    for i in range(3):
        s, m = w.train_step(s, b, jax.random.fold_in(rng, i))
    idx = w._sample(s.gpt_params, rng, 2)
    assert idx.shape == (2, w.composite.seq_len)
    assert int(idx.max()) < 64


@pytest.mark.parametrize("dtype_name", ["VQ_Official", "gaussiandiffusion2d",
                                        "gaussiandiffusion3d"])
def test_vq_diffusion_worker_all_priors(tiny_config, rng, dtype_name):
    from vq_vae_gan_diffusion_tpu.train.vq_diffusion_worker import \
        VQDiffusionWorker
    cfg = tiny_config.replace_path("architecture.model_name", "vqdiffusion")
    cfg = cfg.replace_path("architecture.vqdiffusion.diffusion_type", dtype_name)
    if dtype_name == "VQ_Official":
        cfg = cfg.replace_path("architecture.vqdiffusion.unet_dim", 2)
    w = VQDiffusionWorker(cfg, _run_dir(), debug=True, num_iters_per_epoch=4)
    w.state = w.init_state()
    s1, m1 = w.train_step(w.state, _batch(rng), rng)
    assert np.isfinite(float(m1["loss"]))
    idx = w._sample(s1.ema_params, s1.ema_batch_stats, rng, 2)
    assert idx.shape[0] == 2
    assert int(np.asarray(idx).max()) < 64


def test_gaussian_diffusion_2d_worker(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.gaussian_diffusion_workers import \
        GaussianDiffusion2DWorker
    cfg = tiny_config.replace_path("architecture.model_name", "gaussiandiffusion2d")
    w = GaussianDiffusion2DWorker(cfg, _run_dir(), debug=True)
    w.state = w.init_state()
    s1, m1 = w.train_step(w.state, _batch(rng, ch=1), rng)
    assert np.isfinite(float(m1["loss"]))
    imgs = w._sample(s1.ema_params, rng)
    assert imgs.shape == (4, 32, 32)


def test_gaussian_diffusion_3d_worker(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.gaussian_diffusion_workers import \
        GaussianDiffusion3DWorker
    cfg = tiny_config.replace_path("architecture.model_name", "gaussiandiffusion3d")
    w = GaussianDiffusion3DWorker(cfg, _run_dir(), debug=True,
                                  num_iters_per_epoch=4)
    w.state = w.init_state()
    s1, m1 = w.train_step(w.state, _batch(rng), rng)
    assert np.isfinite(float(m1["loss"]))
    imgs = w._sample(s1.ema_params, s1.ema_batch_stats, rng, 2)
    assert imgs.shape == (2, 32, 32, 3)
