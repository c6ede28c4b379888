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
