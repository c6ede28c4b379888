"""Pipeline parallelism for the stage-2 GPT prior (GPipe schedule).

No reference analogue (the reference is single-device; SURVEY §2.7) — this is
the TPU-native scale-out knob for priors too deep for one chip even under
FSDP: the block stack is split into S contiguous stages, the stage axis is
sharded over a ``pipe`` mesh axis, and microbatches stream through the stages
with ``lax.ppermute`` hops between neighbours (ICI traffic only; the
"How to Scale Your Model" pipelining recipe).

Design — one SPMD program, no per-stage code:

- block params are stacked layer-major: every Block leaf becomes
  ``[S, L/S, ...]`` and dim 0 is sharded over ``pipe``
  (:func:`stack_block_params`). Embedding / ln_f / head stay replicated —
  they are tiny next to the stack;
- :func:`pipeline_apply` runs the GPipe schedule inside ``shard_map``: a
  ``lax.scan`` over ``n_micro + S - 1`` ticks where every device applies ITS
  stage (an inner scan over its L/S layers) to the activation it holds, then
  rotates the result to its right neighbour. Stage 0 injects a fresh
  microbatch each tick; the last stage's outputs are collected and
  ``psum``-broadcast over ``pipe`` at the end (so the loss/sampling code
  after the pipeline is ordinary replicated JAX);
- the whole schedule is differentiable: ``jax.grad`` transposes the scan and
  the ``ppermute`` (reverse hops), yielding the GPipe
  all-forward-then-all-backward schedule automatically, with grads laid out
  exactly like the stacked params (i.e. sharded over ``pipe`` — the memory
  win extends to grads and optimizer moments).

The idle-stage compute during fill/drain (the pipeline bubble) is the
standard GPipe cost: utilization ≈ n_micro / (n_micro + S - 1). Choose
``n_micro ≥ 4·S`` to keep the bubble under ~20%.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mingpt import GPT, Block

DATA_AXIS = "data"
PIPE_AXIS = "pipe"


def create_pipeline_mesh(n_stages: int,
                         devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over all devices with axes ``('data', 'pipe')``, |pipe| = n_stages.

    On a real slice, lay the pipe axis along one torus dimension so the
    neighbour hops ride single ICI links; on the virtual CPU mesh the layout
    is irrelevant.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_stages != 0:
        raise ValueError(f"{n} devices not divisible by n_stages={n_stages}")
    arr = np.array(devices).reshape(n // n_stages, n_stages)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def stack_block_params(gpt_params: Dict[str, Any], n_layer: int,
                       n_stages: int) -> Tuple[Any, Dict[str, Any]]:
    """Split GPT params into (stage-stacked block stack, replicated rest).

    Returns ``(stacked, rest)`` where every leaf of ``stacked`` is
    ``[S, L/S, *leaf.shape]`` (stage-major, layer-minor) and ``rest`` holds
    tok_emb / pos_emb / ln_f / head unchanged.
    """
    if n_layer % n_stages != 0:
        raise ValueError(f"n_layer={n_layer} not divisible by n_stages={n_stages}")
    per = n_layer // n_stages
    blocks = [gpt_params[f"block{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape((n_stages, per) + leaves[0].shape),
        *blocks)
    rest = {k: v for k, v in gpt_params.items() if not k.startswith("block")}
    return stacked, rest


def unstack_block_params(stacked: Any, rest: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stack_block_params` (checkpoint / sampling interop)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    s, per = leaves[0].shape[:2]
    params = dict(rest)
    for i in range(s * per):
        params[f"block{i}"] = jax.tree_util.tree_map(
            lambda leaf: leaf[i // per, i % per], stacked)
    return params


def shard_stacked(stacked: Any, mesh: Mesh) -> Any:
    """Place the stage-stacked stack on the mesh, stage dim over 'pipe'."""
    def put(leaf):
        spec = P(PIPE_AXIS, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, stacked)


def pipeline_apply(gpt: GPT, stacked: Any, x: jax.Array, mesh: Mesh,
                   n_micro: int, *, deterministic: bool = True) -> jax.Array:
    """Run the block stack over ``x`` [B, T, C] with the GPipe schedule.

    ``stacked`` leaves are [S, L/S, ...] sharded over 'pipe'; ``x`` is
    batch-sharded over 'data' (B must divide by |data| · n_micro). Returns
    the post-stack activation, same sharding as ``x``.
    """
    s = mesh.shape[PIPE_AXIS]
    per_shard = x.shape[0] // mesh.shape[DATA_AXIS]
    if per_shard % n_micro != 0 or per_shard < n_micro:
        raise ValueError(
            f"per-data-shard batch {per_shard} (global {x.shape[0]} over "
            f"|data|={mesh.shape[DATA_AXIS]}) must be a multiple of "
            f"n_micro={n_micro}")
    block = Block(gpt.n_head, gpt.n_embd, gpt.attn_pdrop, gpt.resid_pdrop,
                  gpt.dtype)

    def stage_fn(stage_params, h):
        # one pipeline stage = scan over its L/S resident layers
        def layer(h, lp):
            return block.apply({"params": lp}, h,
                               deterministic=deterministic), None
        return jax.lax.scan(layer, h, stage_params)[0]

    def pipelined(stage_params, xs):
        # xs: this data-shard's activations [b, T, C]; stage_params [1, L/S, ...]
        stage_params = jax.tree_util.tree_map(lambda l: l[0], stage_params)
        stage = jax.lax.axis_index(PIPE_AXIS)
        b = xs.shape[0]
        mb = b // n_micro
        micro = xs.reshape(n_micro, mb, *xs.shape[1:])
        perm = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            inp = jnp.where(stage == 0,
                            micro[jnp.minimum(t, n_micro - 1)], carry)
            out = stage_fn(stage_params, inp)
            nxt = jax.lax.ppermute(out, PIPE_AXIS, perm)
            # only the last stage's output at drain ticks is a real result
            y = jnp.where(stage == s - 1, out, jnp.zeros_like(out))
            return nxt, y

        zeros = jnp.zeros((mb,) + xs.shape[1:], xs.dtype)
        _, ys = jax.lax.scan(tick, zeros, jnp.arange(n_micro + s - 1))
        ys = ys[s - 1:]                       # [n_micro, mb, T, C], last stage
        # broadcast the last stage's result to every pipe rank so downstream
        # (ln_f/head/loss) runs as ordinary replicated-over-pipe code
        ys = jax.lax.psum(ys, PIPE_AXIS)
        return ys.reshape(xs.shape)

    return jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(stacked, x)


def pipelined_gpt_logits(gpt: GPT, stacked: Any, rest: Dict[str, Any],
                         idx: jax.Array, mesh: Mesh, n_micro: int) -> jax.Array:
    """Full GPT forward [B, T] → [B, T, vocab] with the stack pipelined.

    Embedding / final LN / head run replicated (they are O(vocab·C), dwarfed
    by the L·12C² stack the pipeline shards).
    """
    t = idx.shape[1]
    x = (rest["tok_emb"]["embedding"][idx]
         + rest["pos_emb"][:, :t, :]).astype(gpt.dtype)
    x = pipeline_apply(gpt, stacked, x, mesh, n_micro)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    xn = xc * jax.lax.rsqrt(jnp.mean(xc * xc, -1, keepdims=True) + 1e-5)
    xn = xn * rest["ln_f"]["scale"] + rest["ln_f"]["bias"]
    return jnp.dot(xn.astype(gpt.dtype), rest["head"]["kernel"],
                   preferred_element_type=jnp.float32)


def make_pipeline_train_step(gpt: GPT, opt, mesh: Mesh, n_micro: int):
    """Jitted next-token CE train step over (stacked, rest) pipeline params.

    Grads/updates keep the stacked layout, so optimizer moments live sharded
    over 'pipe' too. Returns ``step(params, opt_state, idx, targets) ->
    (params, opt_state, loss)`` with ``params = (stacked, rest)``.
    """
    @jax.jit
    def step(params, opt_state, idx, targets):
        def loss_fn(params):
            stacked, rest = params
            logits = pipelined_gpt_logits(gpt, stacked, rest, idx, mesh, n_micro)
            return jnp.mean(
                -jax.nn.log_softmax(logits)[
                    jnp.arange(idx.shape[0])[:, None],
                    jnp.arange(idx.shape[1])[None, :], targets])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step
