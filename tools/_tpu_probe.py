#!/usr/bin/env python
"""Canonical TPU health probe: prints measured matmul TFLOP/s, exits 0/1.

Times a 150-long chain of 4096x4096 bf16 matmuls (20.6 TFLOP) reduced
ON-DEVICE to one f32 scalar, so the host readback that fences the timing is
O(1) bytes. The previous probe fetched the full 32 MB result over the axon
tunnel *inside the timed region*, which bounds the reading by tunnel
bandwidth rather than chip health — that probe was never observed passing
its own >60/>80 bar on healthy hardware (the 17,618 img/s record in
BENCHMARKS.md predates the gate), so a bandwidth-limited tunnel could have
deadlocked every health-gated consumer (bench.py, tools/tpu_recovery_queue.sh)
forever.

Calibration: the degraded tunnel mode reads ~2-3 TFLOP/s on this chain; a
healthy v5e chip should sustain well above 70 on 4096^2 bf16 matmuls even
with the scan/tanh overhead and one scalar RTT (~30 ms against a ~200 ms
healthy run). The bar therefore sits at 45: >15x the degraded mode, and
comfortably below any plausible healthy reading.

Usage: python tools/_tpu_probe.py [bar_tflops]
Runs standalone in a subprocess (callers time it out — in a FULL tunnel
wedge even `import jax` can hang, CLAUDE.md) or import `measure()` in a
process that already holds jax.
"""
from __future__ import annotations

import os
import sys
import time

LENGTH = 150
FLOPS = 2 * 4096 ** 3 * LENGTH
DEFAULT_BAR_TFLOPS = 45.0


def measure() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)

    def chain(a):
        c = jax.lax.scan(lambda c, _: (jnp.tanh(c @ a), None),
                         a, None, length=LENGTH)[0]
        return jnp.sum(c.astype(jnp.float32))  # O(1)-byte readback fence

    g = jax.jit(chain)
    # Two warm-ups: the first compiles; jit recompiles ONCE when args
    # transition uncommitted->committed shardings (CLAUDE.md gotcha), so a
    # second execution guarantees the timed call below hits the warm cache.
    float(np.asarray(g(a)))
    float(np.asarray(g(a)))
    t0 = time.perf_counter()
    float(np.asarray(g(a)))  # block_until_ready does not fence on axon
    return FLOPS / (time.perf_counter() - t0) / 1e12


if __name__ == "__main__":
    # persistent compile cache saves ~seconds per probe across subprocesses.
    # NB: bench.py runs this source via `python -c`, where __file__ is
    # undefined — fall back to cwd-relative imports there.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(here, ".."))
    except NameError:
        sys.path.insert(0, os.getcwd())
    try:
        from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    bar = float(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_BAR_TFLOPS
    tf = measure()
    print(f"{tf:.1f}")
    sys.exit(0 if tf > bar else 1)
