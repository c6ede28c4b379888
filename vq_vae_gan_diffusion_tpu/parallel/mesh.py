"""Device mesh + sharding helpers.

The reference is single-device (SURVEY §2.7: ``torch.device('cuda:0')``,
train.py:76-82, no process groups anywhere). The TPU rebuild makes data
parallelism first-class and leaves a ``model`` axis available for tensor
parallelism of the transformer prior:

- ``create_mesh()`` builds a ``jax.sharding.Mesh`` over all visible devices
  with axes ``('data', 'model')`` (model=1 by default — pure DP);
- batches are sharded over ``data``; params are replicated unless a param
  sharding rule maps them onto ``model``;
- XLA inserts ``psum``/``all_gather`` over ICI; there is no user-managed
  communication backend (the JAX analogue of the reference's absent NCCL
  setup).

Works identically on a virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``) and on real TPU
slices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                model_parallel: int = 1) -> Mesh:
    """Mesh over all devices: ('data', 'model') with |model| = model_parallel."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host pytree of arrays on the mesh, batch-sharded over 'data'."""
    def put(x):
        sh = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(batch: Any, multiple: int) -> Any:
    """Pad the leading axis up to a multiple (static shapes for jit).

    Returns (padded_batch, real_count). Padding repeats the last element so
    statistics stay finite; loss masking is the caller's job when it matters.
    """
    import jax.numpy as jnp

    def pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], rem, axis=0)], axis=0)

    leaves = jax.tree_util.tree_leaves(batch)
    real = leaves[0].shape[0] if leaves else 0
    return jax.tree_util.tree_map(pad, batch), real


def gpt_param_sharding_rules(path: tuple, value: Any) -> P:
    """PartitionSpec for GPT params under tensor parallelism.

    Attention qkv/proj and MLP kernels are sharded over the 'model' axis on
    their feature dimension; everything else is replicated. Used by
    ``train.vq_transformer_worker`` and the multi-chip dryrun.
    """
    name = "/".join(str(p) for p in path)
    if value.ndim == 2:
        if any(k in name for k in ("qkv", "fc_in")):
            return P(None, MODEL_AXIS)          # column parallel
        if any(k in name for k in ("attn_proj", "fc_out")):
            return P(MODEL_AXIS, None)          # row parallel
    return P()


def apply_param_sharding(params: Any, mesh: Mesh, rules=gpt_param_sharding_rules) -> Any:
    """device_put a param pytree with per-leaf PartitionSpecs from `rules`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        spec = rules(path, leaf)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
