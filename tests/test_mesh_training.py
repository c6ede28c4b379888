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
