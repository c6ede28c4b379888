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


# Megatron-style split of the transformer block: the first matmul of each
# pair (attention q/k/v, MLP fc1) is column-parallel (output features
# sharded), the second (attention out-proj, MLP fc2) row-parallel (input
# features sharded) so activations stay 'model'-sharded between them and
# GSPMD inserts exactly one psum per block half. Names must match the REAL
# flax modules in models/mingpt.py (query/key/value/proj, fc1/fc2); the
# generic aliases (qkv/fc_in/attn_proj/fc_out) are kept for packed variants.
_COLUMN_PARALLEL = ("query", "key", "value", "fc1", "qkv", "fc_in", "head")
_ROW_PARALLEL = ("proj", "fc2", "attn_proj", "fc_out")


def gpt_param_sharding_rules(path: tuple, value: Any) -> P:
    """PartitionSpec for GPT params under tensor parallelism.

    Attention q/k/v + MLP fc1 kernels are column-sharded and proj/fc2
    row-sharded over the 'model' axis; the bias-free vocab head is
    column-sharded (vocab dim). Everything else is replicated. Used by
    ``train.vq_transformer_worker`` and the multi-chip dryrun.
    """
    parts = [str(p).strip("'[]") for p in path]
    name = "/".join(parts)
    if value.ndim == 2 and name.endswith("kernel"):
        module = parts[-2] if len(parts) >= 2 else ""
        if any(module == k or k in module for k in _COLUMN_PARALLEL):
            return P(None, MODEL_AXIS)          # column parallel
        if any(module == k or k in module for k in _ROW_PARALLEL):
            return P(MODEL_AXIS, None)          # row parallel
    return P()


def fsdp_param_sharding_rules(mesh: Mesh, min_size: int = 2 ** 14,
                              base_rules=None):
    """FSDP-style parameter sharding: every large leaf is sharded over the
    'data' axis on its largest evenly-divisible dimension.

    Params (and, through jit propagation, optimizer moments) then live
    sharded in HBM at 1/|data| of their replicated footprint; XLA inserts
    all-gathers when a weight is consumed and reduce-scatters on its gradient
    — the ZeRO-3 recipe expressed purely as shardings ("How to Scale Your
    Model" mesh recipe; no reference analogue — the reference is
    single-device, SURVEY §2.7).

    ``base_rules`` (e.g. :func:`gpt_param_sharding_rules`) runs first; any
    dimension it assigned (tensor parallel) is kept, and FSDP picks a
    *different* dimension, giving tp×fsdp composition. Leaves smaller than
    ``min_size`` stay replicated (sharding tiny tensors costs more in
    collective latency than it saves).
    """
    n = mesh.shape[DATA_AXIS]

    def rules(path, value) -> P:
        base = tuple(base_rules(path, value)) if base_rules else ()
        spec = list(base) + [None] * (value.ndim - len(base))
        if n <= 1 or value.size < min_size:
            return P(*spec) if any(s is not None for s in spec) else P()
        dims = sorted(range(value.ndim), key=lambda d: value.shape[d],
                      reverse=True)
        for d in dims:
            if spec[d] is None and value.shape[d] % n == 0 and value.shape[d] >= 2 * n:
                spec[d] = DATA_AXIS
                break
        if not any(s is not None for s in spec):
            return P()
        return P(*spec)

    return rules


def apply_param_sharding(params: Any, mesh: Mesh, rules=gpt_param_sharding_rules) -> Any:
    """device_put a param pytree with per-leaf PartitionSpecs from `rules`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        spec = rules(path, leaf)
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def resolve_sharding_rules(mode: str, mesh: Mesh, base_rules=gpt_param_sharding_rules):
    """Map a config string to param-sharding rules.

    ``replicated`` → None (params replicated), ``tp`` → tensor parallel over
    'model', ``fsdp`` → ZeRO-3 over 'data', ``tp_fsdp`` → both composed.
    """
    mode = (mode or "replicated").lower()
    if mode in ("replicated", "none", ""):
        return None
    if mode == "tp":
        return base_rules
    if mode == "fsdp":
        return fsdp_param_sharding_rules(mesh)
    if mode in ("tp_fsdp", "fsdp_tp"):
        return fsdp_param_sharding_rules(mesh, base_rules=base_rules)
    raise ValueError(f"unknown param_sharding mode {mode!r}")
