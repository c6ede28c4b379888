"""Eval metrics + end-to-end convergence smoke (SURVEY §4 plan item c: MNIST
VQVAE convergence smoke runnable on CPU — here on the synthetic set)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.utils.eval_metrics import feature_fid, psnr, ssim


def test_psnr_ssim_identities(rng):
    a = np.random.default_rng(0).random((4, 16, 16, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    b = np.clip(a + 0.1, 0, 1)
    assert psnr(a, b) < 30
    assert 0 < ssim(a, b) < 1


def test_feature_fid_orders():
    rng = np.random.default_rng(0)
    real = rng.random((32, 32, 32, 3)).astype(np.float32)
    close = np.clip(real + 0.02 * rng.standard_normal(real.shape), 0, 1).astype(np.float32)
    far = rng.random((32, 32, 32, 3)).astype(np.float32) ** 4  # different dist
    fid_close = feature_fid(real, close)
    fid_far = feature_fid(real, far)
    assert fid_close < fid_far


def test_vqvae_converges_on_synthetic(tiny_config, rng):
    """Loss must drop substantially within 40 steps — end-to-end gradient flow
    through encoder/codebook/decoder + LPIPS + Adam."""
    from vq_vae_gan_diffusion_tpu.data import Preprocessor, SyntheticDataset
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    ds = SyntheticDataset(16, 32, 3, seed=7)
    prep = Preprocessor(32, (0.5,) * 3, (0.5,) * 3)
    batch = jnp.asarray(np.stack([prep(ds.get_image(i)) for i in range(8)]))

    w = VQGANVQVAEWorker(tiny_config, tempfile.mkdtemp(), debug=True)
    state = w.init_state()
    first = last = None
    for i in range(40):
        state, m = w.train_step(state, batch, jax.random.fold_in(rng, i))
        if i == 0:
            first = float(np.asarray(m["perceptual_rec_loss"]))
    last = float(np.asarray(m["perceptual_rec_loss"]))
    assert last < 0.7 * first, (first, last)

    # reconstructions should beat a gray-image baseline in PSNR
    w.state = state
    rec = np.asarray(w.reconstruct(batch))
    img01 = np.asarray(batch) * 0.5 + 0.5
    rec01 = np.clip(rec * 0.5 + 0.5, 0, 1)
    assert psnr(img01, rec01) > psnr(img01, np.full_like(img01, 0.5))
