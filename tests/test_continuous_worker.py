"""Continuous c_/v_ VQ-diffusion worker smoke tests."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("name", ["c_vqdiffusion", "v_vqdiffusion"])
def test_continuous_vq_worker(tiny_config, rng, name):
    from vq_vae_gan_diffusion_tpu.train import build_worker
    cfg = tiny_config.replace_path("architecture.model_name", name)
    cfg = cfg.replace_path(f"architecture.{name}",
                           {"diffusion_steps": 8, "sampling_steps": 8,
                            "objective": "pred_noise", "resume_path": None,
                            "indices_width": 4, "train_model": True,
                            "freeze_weights": False})
    cfg = cfg.replace_path(f"dataset.batch_size.{name}", {"synthetic": 4})
    w = build_worker(name)(cfg, tempfile.mkdtemp(), debug=True)
    w.state = w.init_state()
    batch = jnp.asarray(jax.random.normal(rng, (4, 32, 32, 3)))
    s1, m1 = w.train_step(w.state, batch, rng)
    assert np.isfinite(float(m1["loss"]))
    s2, m2 = w.train_step(s1, batch, jax.random.fold_in(rng, 1))
    assert np.isfinite(float(m2["loss"]))
    w.state = s2
    idx = w._sample(s2.ema_params, s2.vq_params, rng, 2)
    assert idx.shape == (2, w.composite.seq_length)
    assert int(np.asarray(idx).max()) < 64
