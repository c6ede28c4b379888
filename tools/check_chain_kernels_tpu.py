#!/usr/bin/env python
"""On-device numerical parity of the fused ShuffleNet sampler kernels.

The whole-block `chain` (v3) and batch-packed (v2) kernels are
interpret-verified and lowering-checked, but Mosaic's real-TPU numerics
(sublane-shifted depthwise taps, the upsample interleave reshapes, the
2×128-lane encoder-block matmuls) only prove out on hardware. This check runs
a full folded ShuffleUNet forward for each mode against the XLA shift-add spec
on the REAL chip and reports max deviations — a correctness gate that is
meaningful even while the tunnel is too degraded for timing.

Usage: python tools/check_chain_kernels_tpu.py [--img 32 16] [--base 16]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, nargs=2, default=(32, 16))
    ap.add_argument("--base", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--timesteps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    if jax.default_backend() != "tpu":
        print("ERROR: needs the TPU backend", file=sys.stderr)
        return 2

    H, W = args.img
    unet = ShuffleUNet(args.timesteps, 32, 1, 1, args.base, (1, 2),
                       dtype=jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = unet.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 1)), None,
                              jnp.zeros((1,), jnp.int32), train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    folded = fold_unet(variables, dtype=jnp.float32)

    x = jax.device_put(
        np.random.default_rng(0).normal(size=(args.batch, H, W, 1))
        .astype(np.float32), jax.devices()[0])
    t = jax.device_put(np.array([1, 3, 5, 7][: args.batch], np.int32),
                       jax.devices()[0])

    ref = np.asarray(jax.jit(
        lambda xx, tt: apply_folded(folded, xx, tt, use_pallas=False,
                                    dtype=jnp.float32))(x, t))
    scale = max(abs(float(ref.max())), abs(float(ref.min())), 1e-6)
    ok = True
    for mode in ("pallas", "packed", "chain"):
        try:
            out = np.asarray(jax.jit(
                lambda xx, tt, m=mode: apply_folded(folded, xx, tt,
                                                    use_pallas=m,
                                                    dtype=jnp.float32))(x, t))
            err = float(np.abs(out - ref).max())
            rel = err / scale
            status = "OK" if rel < 1e-3 else "FAIL"
            ok &= status == "OK"
            print(f"{mode:8s} max abs dev {err:.3e} (rel {rel:.3e}) "
                  f"[out scale {scale:.2f}] {status}", flush=True)
        except Exception as e:  # lowering/runtime failure is a finding
            ok = False
            print(f"{mode:8s} ERROR: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("RESULT:", "all kernels numerically match on TPU" if ok
          else "DEVIATIONS/ERRORS found — see above", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
