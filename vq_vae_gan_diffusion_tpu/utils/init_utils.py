"""Parameter-init helpers.

Module ``.init`` programs are large one-shot graphs; compiling them on the TPU
(axon) backend is slow and bypasses the persistent compilation cache. Running
init on the CPU backend and transferring the resulting pytree is 3-50× faster
and cache-friendly; numerics are identical (same PRNG algorithm).
"""

from __future__ import annotations

from typing import Any, Callable

import jax


def init_on_cpu(init_fn: Callable[..., Any], *args, to_device=None, **kwargs) -> Any:
    """Run a flax ``.init`` (or any pure init fn) on CPU, then device_put."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = init_fn(*args, **kwargs)
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # materialize
    if to_device is None:
        devices = jax.devices()
        to_device = devices[0]
    return jax.device_put(variables, to_device)


def torch_like_reinit(params: Any, rng: jax.Array) -> Any:
    """Redraw conv/linear params with torch's default init distributions.

    torch ``Conv*d``/``Linear`` default to kaiming_uniform(a=√5) kernels and
    U(±1/√fan_in) biases; flax defaults to lecun_normal kernels and zero
    biases. Both bounds reduce to U(±1/√fan_in) for the kernel too (with
    a=√5: √(6/((1+a²)·fan_in)) = 1/√fan_in). Fresh-init training dynamics
    differ measurably between the two (the gaussian3d time-to-quality
    harness measured 704 vs 512 steps to the same MSE bar with the SAME
    optimizer/data/eval — tools/time_to_quality.py, 2026-08-21), so workers
    that train torch-parity recipes from scratch redraw with this helper.

    Walks the tree; any dict holding a ``kernel`` gets kernel+bias redrawn
    from the kernel's fan_in (prod of all dims but the last — flax conv
    kernels are [*window, Cin, Cout], linear [in, out], matching torch's
    fan_in). BatchNorm/GroupNorm (scale/bias dicts without ``kernel``),
    embeddings, and everything else keep their flax init.
    """
    import numpy as np

    counter = [0]

    def rebuild(tree):
        if not isinstance(tree, dict):
            return tree
        out = {k: rebuild(v) for k, v in tree.items()}
        if "kernel" in out:
            i = counter[0]
            counter[0] += 1
            k = out["kernel"]
            fan_in = int(np.prod(k.shape[:-1]))
            bound = 1.0 / float(np.sqrt(max(fan_in, 1)))
            r1, r2 = jax.random.split(jax.random.fold_in(rng, i))
            out["kernel"] = jax.random.uniform(r1, k.shape, k.dtype,
                                               -bound, bound)
            if "bias" in out:
                b = out["bias"]
                out["bias"] = jax.random.uniform(r2, b.shape, b.dtype,
                                                 -bound, bound)
        return out

    return rebuild(params)
