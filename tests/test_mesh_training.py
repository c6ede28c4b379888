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


def _shard_consistent(arr):
    """True when every device shard of a (logically replicated) array holds
    identical values."""
    shards = [np.asarray(s.data) for s in arr.addressable_shards]
    return all(np.array_equal(shards[0], s) for s in shards[1:])


def test_discrete_vq_diffusion_train_on_mesh(tiny_config, mesh):
    """VQ_Official train step under dp: the LtState buffers (Lt_history,
    Lt_count, telemetry EMAs) are updated by a scatter over the GLOBAL
     'data'-sharded batch and must come out replicated shard-consistent
    (VERDICT r2 #4; reference buffer semantics vqdiffusionWorker.py:125-140,
    diffusion_vq_official.py:383-388)."""
    import jax

    from vq_vae_gan_diffusion_tpu.parallel import shard_batch
    from vq_vae_gan_diffusion_tpu.train.vq_diffusion_worker import \
        VQDiffusionWorker

    cfg = (tiny_config
           .replace_path("architecture.model_name", "vqdiffusion")
           .replace_path("architecture.vqdiffusion.diffusion_type", "VQ_Official")
           .replace_path("architecture.vqdiffusion.unet_dim", 2))
    w = VQDiffusionWorker(cfg, tempfile.mkdtemp(), mesh=mesh, debug=True,
                          num_iters_per_epoch=4)
    w.state = w.init_state()
    w.place_on_mesh()

    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    B = 8
    state = w.state
    for s in range(2):
        batch = shard_batch(np.random.default_rng(s).normal(
            size=(B, 32, 32, 3)).astype(np.float32), mesh)
        state, m = w.train_step(state, batch, jax.random.fold_in(rng, s))
    jax.block_until_ready(state)
    assert np.isfinite(float(m["loss"]))

    lt = state.lt_state
    # each step scatters one count per GLOBAL batch element
    np.testing.assert_allclose(float(jnp.sum(lt.Lt_count)), 2 * B)
    for name in ("Lt_history", "Lt_count", "acc_ema", "keep_ema"):
        arr = getattr(lt, name)
        assert _shard_consistent(arr), f"LtState.{name} diverged across shards"
    assert float(jnp.sum(lt.Lt_history)) > 0.0  # the EMA actually moved
    # params/EMA stay replicated and consistent too
    leaf = jax.tree_util.tree_leaves(state.unet_params)[0]
    assert _shard_consistent(leaf)


def test_gaussian2d_train_on_mesh(tiny_config, mesh):
    """gaussiandiffusion2d worker dp step on the mesh (VERDICT r2 #4): loss
    finite, params/EMA replicated shard-consistent after the update."""
    import jax

    from vq_vae_gan_diffusion_tpu.parallel import shard_batch
    from vq_vae_gan_diffusion_tpu.train.gaussian_diffusion_workers import \
        GaussianDiffusion2DWorker

    cfg = tiny_config.replace_path("architecture.model_name",
                                   "gaussiandiffusion2d")
    w = GaussianDiffusion2DWorker(cfg, tempfile.mkdtemp(), mesh=mesh, debug=True)
    w.state = w.init_state()
    w.place_on_mesh()

    state = w.state
    rng = jax.random.PRNGKey(3)
    for s in range(2):
        batch = shard_batch(np.random.default_rng(10 + s).normal(
            size=(8, 32, 32, 1)).astype(np.float32), mesh)
        state, m = w.train_step(state, batch, jax.random.fold_in(rng, s))
    jax.block_until_ready(state)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2
    for tree in (state.params, state.ema_params):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        assert _shard_consistent(leaf)


def test_vae_train_on_mesh(tiny_config, mesh):
    """VAE worker dp step on the mesh (VERDICT r3 #8): loss finite, params
    replicated shard-consistent after the update. Ref worker/vaeWorker.py:
    114-140."""
    import jax

    from vq_vae_gan_diffusion_tpu.parallel import shard_batch
    from vq_vae_gan_diffusion_tpu.train.vae_worker import VAEWorker

    cfg = tiny_config.replace_path("architecture.model_name", "vae")
    cfg = cfg.replace_path("dataset.batch_size.vae", {"synthetic": 8})
    w = VAEWorker(cfg, tempfile.mkdtemp(), mesh=mesh, debug=True)
    w.state = w.init_state()
    w.place_on_mesh()

    state = w.state
    rng = jax.random.PRNGKey(5)
    for s in range(2):
        batch = shard_batch(np.random.default_rng(20 + s).normal(
            size=(8, 32, 32, 3)).astype(np.float32), mesh)
        state, m = w.train_step(state, batch, jax.random.fold_in(rng, s))
    jax.block_until_ready(state)
    assert np.isfinite(float(m["vae_loss"]))
    assert int(state.step) == 2
    assert _shard_consistent(jax.tree_util.tree_leaves(state.params)[0])


def test_continuous_vq_train_on_mesh(tiny_config, mesh):
    """Continuous c_ VQ-diffusion worker dp step on the mesh (VERDICT r3 #8):
    unet/EMA params shard-consistent, frozen VQ params untouched."""
    import jax

    from vq_vae_gan_diffusion_tpu.parallel import shard_batch
    from vq_vae_gan_diffusion_tpu.train.continuous_vq_worker import \
        ContinuousVQDiffusionWorker

    cfg = tiny_config.replace_path("architecture.model_name", "c_vqdiffusion")
    cfg = cfg.replace_path("architecture.c_vqdiffusion",
                           {"diffusion_steps": 8, "sampling_steps": 8,
                            "objective": "pred_noise", "resume_path": None,
                            "indices_width": 4, "train_model": True,
                            "freeze_weights": False})
    cfg = cfg.replace_path("dataset.batch_size.c_vqdiffusion", {"synthetic": 8})
    w = ContinuousVQDiffusionWorker(cfg, tempfile.mkdtemp(), mesh=mesh,
                                    debug=True)
    w.state = w.init_state()
    w.place_on_mesh()

    state = w.state
    rng = jax.random.PRNGKey(6)
    for s in range(2):
        batch = shard_batch(np.random.default_rng(30 + s).normal(
            size=(8, 32, 32, 3)).astype(np.float32), mesh)
        state, m = w.train_step(state, batch, jax.random.fold_in(rng, s))
    jax.block_until_ready(state)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2
    for tree in (state.unet_params, state.ema_params):
        assert _shard_consistent(jax.tree_util.tree_leaves(tree)[0])


def test_ar_sampling_dp_sharded(mesh):
    """Mesh-sharded AR sampling (the generate.py path under dp): the KV-cached
    lax.scan decode runs per batch shard via shard_map, token range valid and
    per-shard results identical to the single-device decode with the same key
    (VERDICT r3 #8)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT, sample_tokens

    gpt = GPT(vocab_size=32, block_size=16, n_layer=2, n_head=2, n_embd=16)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16), jnp.int32))["params"]
    params = jax.device_put(params, NamedSharding(mesh, P()))
    n_data = int(mesh.shape["data"])
    sos = jnp.zeros((2 * n_data, 1), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_data)

    def ar_shard(prefix, rng_rows):
        return sample_tokens(gpt, params, rng_rows[0], prefix, 1, 8)

    toks = jax.jit(jax.shard_map(
        ar_shard, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False))(
        jax.device_put(sos, NamedSharding(mesh, P("data"))),
        jax.device_put(keys, NamedSharding(mesh, P("data"))))
    # sample_tokens returns the GENERATED tokens only ([B, steps]), not
    # prefix+generated (models/mingpt.py:241)
    assert toks.shape == (2 * n_data, 8)
    assert 0 <= int(np.asarray(toks).min()) and int(np.asarray(toks).max()) < 32
    # shard 0 must equal the unsharded decode with shard 0's key
    ref = sample_tokens(gpt, params, keys[0], sos[:2], 1, 8)
    np.testing.assert_array_equal(np.asarray(toks[:2]), np.asarray(ref))
