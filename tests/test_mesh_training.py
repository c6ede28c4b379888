"""End-to-end worker.train() over the 8-device mesh (the path real multi-chip
runs take: BaseWorker.place_on_mesh replication + 'data'-sharded batches)."""

import tempfile

import numpy as np


def test_vqgan_train_loop_on_mesh(tiny_config, mesh):
    from vq_vae_gan_diffusion_tpu.data import (DataLoader, Preprocessor,
                                               SyntheticDataset)
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    ds = SyntheticDataset(16, 32, 3)
    loader = DataLoader(ds, 8, Preprocessor(32, (0.5,) * 3, (0.5,) * 3),
                        shuffle=True, drop_last=True, seed=0)
    w = VQGANVQVAEWorker(tiny_config, tempfile.mkdtemp(), mesh=mesh, debug=True)
    metrics = w.train(loader, epochs=1)
    assert np.isfinite(metrics["vq_loss"])
    assert w.global_step >= 1


def test_multi_step_scan_matches_per_step(tiny_config, mesh):
    """train_multi_step (K steps in one lax.scan dispatch) must produce the
    same state trajectory as K sequential train_step dispatches."""
    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    w = VQGANVQVAEWorker(tiny_config, tempfile.mkdtemp(), mesh=mesh, debug=True)
    state0 = w.init_state()
    rng = jax.random.PRNGKey(7)
    K, B = 3, 8
    batches = jax.random.normal(rng, (K, B, 32, 32, 3), jnp.float32)
    rngs = jax.random.split(rng, K)

    s_seq = state0
    for i in range(K):
        s_seq, m_seq = w.train_step(s_seq, batches[i], rngs[i])

    s_scan, m_scan = w.train_multi_step(state0, batches, rngs)
    assert int(s_scan.step) == int(s_seq.step) == K
    # XLA compiles the scan body separately from the straight-line step, so
    # fusion/accumulation order differs; equality is semantic, not bitwise
    np.testing.assert_allclose(float(m_scan["vq_loss"]), float(m_seq["vq_loss"]),
                               rtol=1e-2)
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.vqvae_params),
                    jax.tree_util.tree_leaves(s_seq.vqvae_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


def test_train_loop_steps_per_dispatch(tiny_config, mesh):
    """The epoch loop with trainer.steps_per_dispatch>1 covers every batch
    (including the non-multiple tail) and counts steps correctly."""
    from vq_vae_gan_diffusion_tpu.data import (DataLoader, Preprocessor,
                                               SyntheticDataset)
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    ds = SyntheticDataset(40, 32, 3)  # 5 batches of 8 → K=2 + K=2 + tail of 1
    loader = DataLoader(ds, 8, Preprocessor(32, (0.5,) * 3, (0.5,) * 3),
                        shuffle=False, drop_last=True, seed=0)
    cfg = tiny_config.replace_path("trainer.steps_per_dispatch", 2)
    w = VQGANVQVAEWorker(cfg, tempfile.mkdtemp(), mesh=mesh, debug=False)
    metrics = w.train(loader, epochs=1)
    assert np.isfinite(metrics["vq_loss"])
    assert w.global_step == 5
