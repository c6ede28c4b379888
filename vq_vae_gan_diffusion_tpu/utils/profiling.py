"""Tracing / profiling / memory observability (SURVEY §5 rebuild plan).

The reference's only instrumentation is epoch wall-time + a one-shot GPU
memory print (utils.py:102-117). Here:

- ``profile_steps``: context manager around ``jax.profiler.trace`` — dumps an
  xplane trace viewable in TensorBoard/XProf;
- ``device_memory_stats``: per-device live/peak bytes (TPU analogue of
  ``print_gpu_memory_usage``);
- ``log_device_memory``: logger-friendly wrapper;
- ``reproducibility``: seeds numpy/python (JAX randomness is explicit PRNG
  keys — this covers the host-side shuffles); the reference defined the same
  helper but never called it (utils.py:76-89, SURVEY §5) — our entry points do.
"""

from __future__ import annotations

import contextlib
import logging
import random
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def profile_steps(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    import jax
    stats = {}
    for d in jax.local_devices():
        try:
            ms = d.memory_stats() or {}
        except Exception:
            ms = {}
        stats[str(d)] = {
            "bytes_in_use_gb": ms.get("bytes_in_use", 0) / 1024 ** 3,
            "peak_bytes_in_use_gb": ms.get("peak_bytes_in_use", 0) / 1024 ** 3,
            "bytes_limit_gb": ms.get("bytes_limit", 0) / 1024 ** 3,
        }
    return stats


def log_device_memory(logger: Optional[logging.Logger] = None) -> None:
    logger = logger or logging.getLogger("vqgd")
    for dev, s in device_memory_stats().items():
        logger.info("%s: in_use %.2f GB / peak %.2f GB / limit %.2f GB", dev,
                    s["bytes_in_use_gb"], s["peak_bytes_in_use_gb"],
                    s["bytes_limit_gb"])


def reproducibility(seed: int = 42) -> None:
    np.random.seed(seed)
    random.seed(seed)


def param_count(params) -> int:
    import jax
    return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params)))


def print_summary(params, logger: Optional[logging.Logger] = None,
                  name: str = "model") -> None:
    """Per-top-level-module parameter counts (torchsummary-lite, utils.py:13-25)."""
    import jax
    logger = logger or logging.getLogger("vqgd")
    total = param_count(params)
    logger.info("%s: %.2fM params total", name, total / 1e6)
    if isinstance(params, dict):
        for k, v in params.items():
            logger.info("  %-24s %.2fM", k, param_count(v) / 1e6)


def clean_directory(path: str) -> None:
    """Remove all files in a directory (reference utils.py:65-73)."""
    import os
    import shutil
    if not os.path.isdir(path):
        return
    for entry in os.listdir(path):
        p = os.path.join(path, entry)
        if os.path.isfile(p) or os.path.islink(p):
            os.unlink(p)
        else:
            shutil.rmtree(p)
