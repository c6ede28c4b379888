"""Coverage for the less-default prior modes: one_hot indices_to_dist_fn,
distribute_dim=1, VQ_Official with the Conv2d U-Net, and the InterHand
hand-mask weighting path in the VQGAN step."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cfg(tiny_config, **vqd_overrides):
    cfg = tiny_config.replace_path("architecture.model_name", "vqdiffusion")
    for k, v in vqd_overrides.items():
        cfg = cfg.replace_path(f"architecture.vqdiffusion.{k}", v)
    return cfg


@pytest.mark.parametrize("fn,ddim", [("one_hot", -1), ("one_hot", 1),
                                     ("lookup_table", 1)])
def test_gaussian2d_modes(tiny_config, rng, fn, ddim):
    from vq_vae_gan_diffusion_tpu.train.vq_diffusion_worker import \
        VQDiffusionWorker
    cfg = _cfg(tiny_config, diffusion_type="gaussiandiffusion2d",
               indices_to_dist_fn=fn, distribute_dim=ddim)
    w = VQDiffusionWorker(cfg, tempfile.mkdtemp(), debug=True,
                          num_iters_per_epoch=4)
    w.state = w.init_state()
    batch = jnp.asarray(jax.random.normal(rng, (4, 32, 32, 3)))
    s1, m1 = w.train_step(w.state, batch, rng)
    assert np.isfinite(float(m1["loss"]))
    idx = w._sample(s1.ema_params, s1.ema_batch_stats, rng, 2)
    assert idx.shape == (2, w.composite.seq_len)
    assert int(np.asarray(idx).max()) < 64


def test_vq_official_conv2d_unet(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.vq_diffusion_worker import \
        VQDiffusionWorker
    cfg = _cfg(tiny_config, diffusion_type="VQ_Official", unet_dim=3)
    w = VQDiffusionWorker(cfg, tempfile.mkdtemp(), debug=True,
                          num_iters_per_epoch=4)
    w.state = w.init_state()
    batch = jnp.asarray(jax.random.normal(rng, (2, 32, 32, 3)))
    s1, m1 = w.train_step(w.state, batch, rng)
    assert np.isfinite(float(m1["loss"]))
    # importance-sampling state advanced
    assert float(jnp.sum(s1.lt_state.Lt_count)) == 2.0


def test_hand_mask_weighting(tiny_config, rng):
    """InterHand path: perceptual+rec map is masked by denorm-red > 20/255
    (vqganVqvaeWorker.py:287-297)."""
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    cfg = tiny_config.replace_path("dataset.dataset_name", "InterHand26M")
    cfg = cfg.replace_path("dataset.get_hand_mask", True)
    cfg = cfg.replace_path("dataset.img_channels",
                           {"InterHand26M": 3, "synthetic": 3})
    cfg = cfg.replace_path("dataset.img_size", {"InterHand26M": 32, "synthetic": 32})
    cfg = cfg.replace_path("dataset.batch_size",
                           {"vqvae": {"InterHand26M": 4}})
    w = VQGANVQVAEWorker(cfg, tempfile.mkdtemp(), debug=True)
    assert w.use_hand_mask
    w.state = w.init_state()
    # an all-black batch denormalizes to 0.5 > 20/255 → mask all ones; an image
    # at -1 (denorm 0) → mask zero → loss contribution only from unmasked
    black = jnp.full((4, 32, 32, 3), -1.0)
    s1, m1 = w.train_step(w.state, black, rng)
    assert float(m1["perceptual_rec_loss"]) == 0.0  # fully masked out
    gray = jnp.zeros((4, 32, 32, 3))
    s2, m2 = w.train_step(w.state, gray, rng)
    assert float(m2["perceptual_rec_loss"]) > 0.0
