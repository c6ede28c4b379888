"""FSDP/ZeRO-3 parameter sharding, remat, and gradient accumulation.

No reference analogue (the reference is single-device, SURVEY §2.7); these are
the scale knobs for large stage-2 priors: params+moments sharded over 'data'
(composable with the GPT tensor-parallel rules over 'model'), per-block
rematerialization, and optax.MultiSteps accumulation.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.parallel import (DATA_AXIS, MODEL_AXIS,
                                               create_mesh,
                                               fsdp_param_sharding_rules,
                                               gpt_param_sharding_rules,
                                               resolve_sharding_rules,
                                               shard_batch)


@pytest.fixture(scope="module")
def big_gpt_config(request):
    cfg = request.getfixturevalue("tiny_config")
    cfg = cfg.replace_path("architecture.model_name", "vqvae_transformer")
    cfg = cfg.replace_path("architecture.vqvae_transformer.n_embd", 256)
    cfg = cfg.replace_path("dataset.batch_size.vqvae_transformer",
                           {"synthetic": 8})
    return cfg


def test_fsdp_rules_shard_large_leaves(mesh):
    rules = fsdp_param_sharding_rules(mesh)
    big = jnp.zeros((1024, 256))
    small = jnp.zeros((64, 2))
    assert DATA_AXIS in tuple(rules((), big))
    assert tuple(rules((), small)) == ()


def test_tp_fsdp_rules_compose(mesh):
    rules = fsdp_param_sharding_rules(mesh, base_rules=gpt_param_sharding_rules)
    # a qkv kernel: TP shards dim 1 over 'model', FSDP takes dim 0 over 'data'
    path = (jax.tree_util.DictKey("block0"), jax.tree_util.DictKey("qkv"),
            jax.tree_util.DictKey("kernel"))
    spec = tuple(rules(path, jnp.zeros((256, 768))))
    assert spec == (DATA_AXIS, MODEL_AXIS)


def test_tp_rules_match_real_gpt_params(mesh):
    """Regression: the rules must fire on the ACTUAL flax module names
    (query/key/value/proj, fc1/fc2, head) — round-2 shipped rules that only
    matched synthetic aliases (qkv/fc_in/...), silently sharding zero leaves
    and degrading tp mode to replicated. Also asserts tp numerics are exact
    against the replicated forward."""
    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT
    from vq_vae_gan_diffusion_tpu.parallel import (apply_param_sharding,
                                                   batch_sharding)

    gpt = GPT(vocab_size=32, block_size=16, n_layer=2, n_head=2, n_embd=16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 32)
    params = gpt.init(jax.random.PRNGKey(0), idx)["params"]

    specs = {"/".join(str(p) for p in path): tuple(
        gpt_param_sharding_rules(path, leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    col = [k for k, s in specs.items() if s == (None, MODEL_AXIS)]
    row = [k for k, s in specs.items() if s == (MODEL_AXIS, None)]
    # per block: q,k,v,fc1 column (+ the vocab head); proj,fc2 row
    assert len(col) == 2 * 4 + 1 and len(row) == 2 * 2, specs
    assert all("kernel" in k for k in col + row)

    tp_mesh = create_mesh(model_parallel=4)
    sharded = apply_param_sharding(params, tp_mesh, gpt_param_sharding_rules)
    ref = gpt.apply({"params": params}, idx)
    out = jax.jit(lambda p, i: gpt.apply({"params": p}, i))(
        sharded, jax.device_put(idx, batch_sharding(tp_mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_resolve_sharding_modes(mesh):
    assert resolve_sharding_rules("replicated", mesh) is None
    assert resolve_sharding_rules("tp", mesh) is gpt_param_sharding_rules
    assert callable(resolve_sharding_rules("fsdp", mesh))
    with pytest.raises(ValueError):
        resolve_sharding_rules("bogus", mesh)


def test_fsdp_training_step(big_gpt_config):
    """GPT stage-2 train step with params+moments sharded over data×model;
    shardings must survive the update and the loss must match replicated."""
    from vq_vae_gan_diffusion_tpu.train.vq_transformer_worker import (
        VQTransformerWorker)

    mesh = create_mesh(model_parallel=2)  # 4×2 over the 8 virtual devices
    cfg = big_gpt_config.replace_path(
        "trainer.vqvae_transformer.param_sharding", "tp_fsdp")
    w = VQTransformerWorker(cfg, tempfile.mkdtemp(), mesh=mesh, debug=True)
    w.state = w.init_state()
    w.place_on_mesh()

    # at least one leaf (params and its adam moment) must actually be sharded
    def sharded_leaves(tree):
        return [l for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "sharding") and
                any(s is not None for s in getattr(l.sharding, "spec", ()))]
    assert sharded_leaves(w.state.gpt_params), "no param leaf got sharded"
    assert sharded_leaves(w.state.opt_state), "opt moments not sharded"

    imgs = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32)
    batch = shard_batch(imgs, mesh)
    state2, metrics = w.train_step(w.state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["ce_loss"]))
    assert sharded_leaves(state2.gpt_params), "update dropped the sharding"

    # replicated run on the same data gives the same loss (sharding is an
    # execution detail, not a numerics change)
    w2 = VQTransformerWorker(big_gpt_config, tempfile.mkdtemp(), mesh=mesh,
                             debug=True)
    w2.state = w2.init_state()
    w2.place_on_mesh()
    _, m2 = w2.train_step(w2.state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["ce_loss"]), float(m2["ce_loss"]),
                               rtol=2e-4)


def test_fsdp_full_training_loop(big_gpt_config):
    """BaseWorker.train() end-to-end with fsdp param sharding: place_on_mesh
    runs inside the loop, batches are data-sharded, loss finite."""
    import tempfile

    from vq_vae_gan_diffusion_tpu.data import (DataLoader, Preprocessor,
                                               SyntheticDataset)
    from vq_vae_gan_diffusion_tpu.train.vq_transformer_worker import (
        VQTransformerWorker)

    mesh = create_mesh()
    cfg = big_gpt_config.replace_path(
        "trainer.vqvae_transformer.param_sharding", "fsdp")
    w = VQTransformerWorker(cfg, tempfile.mkdtemp(), mesh=mesh, debug=True)
    ds = SyntheticDataset(16, 32, 3)
    loader = DataLoader(ds, 8, Preprocessor(32, (0.5,) * 3, (0.5,) * 3),
                        shuffle=False, drop_last=True, seed=0)
    metrics = w.train(loader, epochs=1)
    assert np.isfinite(metrics["ce_loss"])
    sharded = [l for l in jax.tree_util.tree_leaves(w.state.gpt_params)
               if any(s is not None for s in getattr(l.sharding, "spec", ()))]
    assert sharded, "loop dropped the fsdp sharding"


def test_remat_same_numerics(big_gpt_config, rng):
    """remat=True recomputes activations in backward: same loss and grads."""
    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT

    idx = jax.random.randint(rng, (2, 16), 0, 64)

    def loss_for(remat):
        gpt = GPT(vocab_size=64, block_size=32, n_layer=2, n_head=4,
                  n_embd=32, remat=remat)
        params = gpt.init(jax.random.PRNGKey(0), idx)["params"]

        def loss(p):
            logits = gpt.apply({"params": p}, idx)
            return jnp.mean(logits ** 2)
        return jax.value_and_grad(loss)(params)

    (l0, g0), (l1, g1) = loss_for(False), loss_for(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gradient_accumulation(big_gpt_config):
    """gradient_accumulate_every=2: params move only every second step."""
    from vq_vae_gan_diffusion_tpu.train.vq_transformer_worker import (
        VQTransformerWorker)

    cfg = big_gpt_config.replace_path(
        "trainer.vqvae_transformer.gradient_accumulate_every", 2)
    w = VQTransformerWorker(cfg, tempfile.mkdtemp(), debug=True)
    state0 = w.init_state()
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 32, 32, 3)).astype(np.float32))

    state1, _ = w.train_step(state0, imgs, jax.random.PRNGKey(1))
    l0 = jax.tree_util.tree_leaves(state0.gpt_params)[0]
    l1 = jax.tree_util.tree_leaves(state1.gpt_params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    state2, _ = w.train_step(state1, imgs, jax.random.PRNGKey(2))
    l2 = jax.tree_util.tree_leaves(state2.gpt_params)[0]
    assert not np.array_equal(np.asarray(l1), np.asarray(l2))
