#!/usr/bin/env python
"""TPU validation for the in-kernel-PRNG fused posterior sampler.

The pytest suite pins itself to the virtual CPU mesh (tests/conftest.py), and
``pltpu.prng_*`` has no CPU lowering — so the TPU-gated test
``test_prng_kernel_on_tpu`` always skips there. This runner loads the test
module WITHOUT conftest and executes it against the real chip (determinism,
validity, truncated-support confinement, TV-distance vs the XLA sampler).
"""
import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    import jax
    if jax.devices()[0].platform != "tpu":
        print("SKIP: no TPU visible")
        return 1
    spec = importlib.util.spec_from_file_location(
        "t_dpp", os.path.join(ROOT, "tests",
                              "test_discrete_posterior_pallas.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.test_gumbel_from_bits_transform()
    print("gumbel transform OK")
    mod.test_prng_kernel_on_tpu()
    print("prng kernel OK (deterministic, valid, truncated support, "
          "TV vs XLA sampler)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
