"""Infrastructure tests: config quirks, data pipeline, checkpoint round-trip,
mesh data parallelism (the fake-backend-analogue tests of SURVEY §4d)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# -- config -----------------------------------------------------------------

def test_config_none_string_normalization(tmp_path):
    from vq_vae_gan_diffusion_tpu.config import load_config
    p = tmp_path / "c.yml"
    p.write_text("a: None\nb: 'None'\nc: (0.65, 0.95)\nd: inf\ne: {f: None}\n")
    cfg = load_config(str(p))
    assert cfg.a is None and cfg.b is None
    assert cfg.c == (0.65, 0.95)
    assert cfg.d == float("inf")
    assert cfg.e.f is None


def test_config_helpers(tiny_config):
    from vq_vae_gan_diffusion_tpu.config import (resolve_batch_size,
                                                 resolve_img_size, seq_len)
    assert resolve_img_size(tiny_config) == 32
    assert resolve_batch_size(tiny_config) == 8
    assert seq_len(tiny_config) == 64


# -- data -------------------------------------------------------------------

def test_synthetic_dataset_deterministic():
    from vq_vae_gan_diffusion_tpu.data import SyntheticDataset
    ds = SyntheticDataset(16, 32, 3, seed=1)
    a = ds.get_image(5)
    b = ds.get_image(5)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8


def test_dataloader_batching_and_shuffle(tiny_config):
    from vq_vae_gan_diffusion_tpu.data import (DataLoader, Preprocessor,
                                               SyntheticDataset)
    ds = SyntheticDataset(20, 16, 3)
    prep = Preprocessor(16, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    dl = DataLoader(ds, batch_size=8, preprocess=prep, shuffle=True,
                    drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2  # 20 // 8, drop_last
    assert batches[0].shape == (8, 16, 16, 3)
    assert batches[0].dtype == np.float32
    # epoch reshuffle changes order
    batches2 = list(dl)
    assert not np.array_equal(batches[0], batches2[0])


def test_load_dataloader_synthetic_fallback(tiny_config):
    from vq_vae_gan_diffusion_tpu.data import load_dataloader
    loader, ds = load_dataloader("synthetic", "train", None, tiny_config)
    batch = next(iter(loader))
    assert batch.shape[0] == 8


def test_preprocessor_normalization_roundtrip():
    from vq_vae_gan_diffusion_tpu.data import Preprocessor
    from vq_vae_gan_diffusion_tpu.data.transforms import denormalize
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    prep = Preprocessor(16, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    out = prep(img)
    back = denormalize(out, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    np.testing.assert_allclose(back, img.astype(np.float32) / 255, atol=1e-6)


# -- checkpointing -----------------------------------------------------------

def test_checkpoint_roundtrip():
    from vq_vae_gan_diffusion_tpu.utils import (restore_checkpoint,
                                                save_checkpoint)
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": 7, "nested": {"b": jnp.ones((4,))}}
    d = tempfile.mkdtemp()
    save_checkpoint(d, 7, tree)
    restored = restore_checkpoint(d, target=tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert restored["step"] == 7


def test_worker_checkpoint_roundtrip(tiny_config, rng):
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    d = tempfile.mkdtemp()
    w = VQGANVQVAEWorker(tiny_config, d, debug=True)
    w.state = w.init_state()
    batch = jnp.asarray(jax.random.normal(rng, (4, 32, 32, 3)))
    w.state, _ = w.train_step(w.state, batch, rng)
    w.global_step = 1
    w.save(epoch=0)

    w2 = VQGANVQVAEWorker(tiny_config, tempfile.mkdtemp(), debug=True,
                          save_ckpt_dir=w.save_ckpt_dir)
    w2.state = w2.init_state()
    w2.load()
    assert w2.global_step == 1
    a = jax.tree_util.tree_leaves(w.state.vqvae_params)
    b = jax.tree_util.tree_leaves(w2.state.vqvae_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # training continues from the restored state
    w2.state, m = w2.train_step(w2.state, batch, rng)
    assert np.isfinite(float(m["vq_loss"]))


# -- mesh / data parallelism --------------------------------------------------

def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_shard_batch_even_split(mesh):
    from vq_vae_gan_diffusion_tpu.parallel import shard_batch
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sx = shard_batch(x, mesh)
    assert sx.sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_dp_train_step_matches_single_device(tiny_config, rng, mesh):
    """The jitted VQVAE step must produce identical metrics whether the batch
    lives on one device or is sharded over the 8-device mesh — XLA inserts the
    collectives; semantics must not change."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vq_vae_gan_diffusion_tpu.parallel import shard_batch
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    w = VQGANVQVAEWorker(tiny_config, tempfile.mkdtemp(), debug=True)
    state = w.init_state()
    batch = np.asarray(jax.random.normal(rng, (8, 32, 32, 3)), np.float32)

    s1, m1 = w.train_step(state, jnp.asarray(batch), rng)

    state_repl = jax.device_put(state, NamedSharding(mesh, P()))
    sharded = shard_batch(batch, mesh)
    rng_repl = jax.device_put(rng, NamedSharding(mesh, P()))
    w.lpips_params = jax.device_put(w.lpips_params, NamedSharding(mesh, P()))
    s2, m2 = w.train_step(state_repl, sharded, rng_repl)

    assert abs(float(m1["vq_loss"]) - float(m2["vq_loss"])) < 1e-4
    a = jax.tree_util.tree_leaves(s1.vqvae_params)
    b = jax.tree_util.tree_leaves(s2.vqvae_params)
    diffs = [float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
             for x, y in zip(a, b)]
    # cross-device reduction order perturbs near-zero grads; Adam can amplify
    # such a perturbation to at most ~2·lr for a single element
    assert max(diffs) < 3 * 2.25e-4


def test_gpt_tensor_parallel_sharding(mesh, rng):
    """GPT forward under tp param sharding matches replicated params."""
    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT
    from vq_vae_gan_diffusion_tpu.parallel import (apply_param_sharding,
                                                   create_mesh)
    mesh2 = create_mesh(model_parallel=2)
    gpt = GPT(vocab_size=32, block_size=16, n_layer=2, n_head=4, n_embd=32)
    idx = jax.random.randint(rng, (4, 8), 0, 32)
    params = gpt.init(rng, idx)["params"]
    ref = gpt.apply({"params": params}, idx)
    sharded = apply_param_sharding(params, mesh2)
    out = jax.jit(lambda p, i: gpt.apply({"params": p}, i))(sharded, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sigterm_checkpoint(tiny_config, tmp_path):
    """SIGTERM during training writes a checkpoint before exiting; a handler
    hit while a save is in flight defers to the next step boundary
    (ADVICE r1: no re-entrant orbax writes from signal context)."""
    import os
    import signal

    from vq_vae_gan_diffusion_tpu.data import (DataLoader, Preprocessor,
                                               SyntheticDataset)
    from vq_vae_gan_diffusion_tpu.train.vae_worker import VAEWorker

    cfg = tiny_config.replace_path("architecture.model_name", "vae")
    w = VAEWorker(cfg, str(tmp_path), debug=False)
    ds = SyntheticDataset(32, 32, 3)
    loader = DataLoader(ds, 8, Preprocessor(32, (0.5,) * 3, (0.5,) * 3),
                        shuffle=False, drop_last=True, seed=0)

    calls = {"n": 0}
    orig_save = w.save

    def save_and_kill(epoch=0):
        orig_save(epoch)
        if calls["n"] == 0:
            calls["n"] += 1
            os.kill(os.getpid(), signal.SIGTERM)  # lands after this save

    w.save = save_and_kill
    with __import__("pytest").raises(SystemExit) as ei:
        w.train(loader, epochs=3)
    assert ei.value.code == 143
    # a checkpoint exists and is restorable
    w2 = VAEWorker(cfg, str(tmp_path), debug=False,
                   save_ckpt_dir=w.save_ckpt_dir)
    w2.state = w2.init_state()
    w2.load()
    assert w2.global_step >= 1
