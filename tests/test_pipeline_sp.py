"""Pipeline parallelism (GPipe over a 'pipe' mesh axis) and sequence
parallelism (token-axis sharding constraints) for the stage-2 GPT prior.

No reference analogue (the reference is single-device, SURVEY §2.7); these
are the depth/sequence scale-out knobs next to dp/tp/fsdp. Everything runs
on the virtual 8-device CPU mesh and asserts EXACT numerics against the
plain single-program forward — parallelism must be an execution detail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vq_vae_gan_diffusion_tpu.models.mingpt import GPT
from vq_vae_gan_diffusion_tpu.parallel import (
    DATA_AXIS, MODEL_AXIS, PIPE_AXIS, create_mesh, create_pipeline_mesh,
    make_pipeline_train_step, pipelined_gpt_logits, shard_batch,
    shard_stacked, stack_block_params, unstack_block_params)


@pytest.fixture(scope="module")
def gpt_and_params():
    gpt = GPT(vocab_size=32, block_size=16, n_layer=4, n_head=2, n_embd=16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 8), 0, 32)
    params = gpt.init(jax.random.PRNGKey(0), idx)["params"]
    return gpt, params, idx


def test_stack_unstack_roundtrip(gpt_and_params):
    gpt, params, _ = gpt_and_params
    stacked, rest = stack_block_params(params, gpt.n_layer, n_stages=2)
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[:2] == (2, 2)  # [S, L/S, ...]
    rt = unstack_block_params(stacked, rest)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(rt)[0]
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_stack_rejects_indivisible(gpt_and_params):
    gpt, params, _ = gpt_and_params
    with pytest.raises(ValueError):
        stack_block_params(params, gpt.n_layer, n_stages=3)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 2), (4, 2)])
def test_pipeline_logits_exact(gpt_and_params, n_stages, n_micro):
    """dp×pp logits == the plain forward, for several stage/microbatch splits."""
    gpt, params, idx = gpt_and_params
    ref = gpt.apply({"params": params}, idx)
    mesh = create_pipeline_mesh(n_stages)
    stacked, rest = stack_block_params(params, gpt.n_layer, n_stages)
    stacked = shard_stacked(stacked, mesh)
    out = jax.jit(lambda s, r, i: pipelined_gpt_logits(
        gpt, s, r, i, mesh, n_micro=n_micro))(
        stacked, rest, shard_batch(np.asarray(idx), mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_train_step_matches_single_device(gpt_and_params):
    """One CE train step under dp×pp: loss matches the unpipelined step and
    the updated stack (and its adam moments) stay sharded over 'pipe'."""
    gpt, params, idx = gpt_and_params
    tgt = jax.random.randint(jax.random.PRNGKey(2), (8, 8), 0, 32)
    opt = optax.adam(1e-2)

    mesh = create_pipeline_mesh(4)
    stacked, rest = stack_block_params(params, gpt.n_layer, 4)
    pp_params = (shard_stacked(stacked, mesh), rest)
    opt_state = opt.init(pp_params)
    step = make_pipeline_train_step(gpt, opt, mesh, n_micro=4)
    pp2, opt_state, loss = step(pp_params, opt_state,
                                shard_batch(np.asarray(idx), mesh),
                                shard_batch(np.asarray(tgt), mesh))

    def ref_loss(p):
        lg = gpt.apply({"params": p}, idx)
        b, t = idx.shape
        return jnp.mean(-jax.nn.log_softmax(lg)[
            jnp.arange(b)[:, None], jnp.arange(t)[None, :], tgt])

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(l_ref), rtol=1e-6)

    spec = jax.tree_util.tree_leaves(pp2[0])[0].sharding.spec
    assert spec[0] == PIPE_AXIS, "update dropped the pipe sharding"
    mom = jax.tree_util.tree_leaves(opt_state[0].mu[0])[0]
    assert mom.sharding.spec[0] == PIPE_AXIS, "adam moments not pipe-sharded"

    # updated params match the single-device update (same opt, same grads).
    # atol: adam's first-step update is sign-like (g/(|g|+eps)) so float
    # noise in near-zero grads can flip a coordinate's magnitude by O(lr·ulp
    # amplification); 5e-5 = 0.5% of lr bounds that without hiding a real
    # schedule/transpose bug (which would show at the lr=1e-2 scale)
    u_ref = optax.apply_updates(
        params, opt.update(g_ref, opt.init(params), params)[0])
    stacked_ref, _ = stack_block_params(u_ref, gpt.n_layer, 4)
    for a, b in zip(jax.tree_util.tree_leaves(pp2[0]),
                    jax.tree_util.tree_leaves(stacked_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_sequence_parallel_forward_exact(gpt_and_params):
    """act_sharding (token axis over 'model') is numerics-neutral and keeps
    the constrained layout through jit."""
    gpt, params, idx = gpt_and_params
    ref = gpt.apply({"params": params}, idx)
    mesh = create_mesh(model_parallel=4)  # data=2 × model=4
    sp = GPT(vocab_size=32, block_size=16, n_layer=4, n_head=2, n_embd=16,
             act_sharding=NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None)))
    out = jax.jit(lambda p, i: sp.apply({"params": p}, i))(
        jax.device_put(params, NamedSharding(mesh, P())),
        shard_batch(np.asarray(idx), mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sequence_parallel_train_grads_exact(gpt_and_params):
    """grad through the SP-constrained forward == unconstrained grads."""
    gpt, params, idx = gpt_and_params
    tgt = jax.random.randint(jax.random.PRNGKey(3), (8, 8), 0, 32)
    mesh = create_mesh(model_parallel=4)
    sp = GPT(vocab_size=32, block_size=16, n_layer=4, n_head=2, n_embd=16,
             act_sharding=NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None)))

    def loss(model, p, i):
        lg = model.apply({"params": p}, i)
        b, t = i.shape
        return jnp.mean(-jax.nn.log_softmax(lg)[
            jnp.arange(b)[:, None], jnp.arange(t)[None, :], tgt])

    g_ref = jax.grad(lambda p: loss(gpt, p, idx))(params)
    g_sp = jax.jit(jax.grad(lambda p: loss(sp, p, idx)))(
        jax.device_put(params, NamedSharding(mesh, P())),
    )
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
