#!/usr/bin/env python
"""Localize the `fused_sampler: chain` MosaicError (BENCHMARKS.md r3 ERROR row).

bench_suite's ddpm `_chain` entry died with `remote_compile HTTP 500:
tpu_compile_helper subprocess exit code 1` in a HEALTHY window, while
bench_bottleneck's stage-level whole-chain kernels all compiled and ran. The
difference is the block-level kernels only the full sampler composes
(`packed_encoder_block`, `packed_bottleneck_chain_whole_up`,
`packed_downsample`, the mid `chain_whole`) at the real sampler shapes
(mults (1,2,4,8), base 64, 256×96 grid, batch 16).

Method: trace the full chain-mode forward with `jax.eval_shape` (abstract —
no Mosaic compile) while RECORDING every Pallas-kernel entry call and its
arguments, then replay each recorded call individually under jit on the real
chip. The first FAIL line pins the crashing lowering. Failures are
deterministic, so even a degraded window localizes correctly.

Usage: python tools/localize_chain_error.py [--batch 16] [--img 256 96]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import vq_vae_gan_diffusion_tpu.models.shuffle_infer as si
import vq_vae_gan_diffusion_tpu.ops.shuffle_pallas as sp

KERNELS = ["packed_encoder_block", "packed_bottleneck_chain_whole",
           "packed_bottleneck_chain_whole_up", "packed_downsample",
           "packed_bottleneck_chain"]


def record_calls(apply_fn, x_spec, t_spec):
    """eval_shape apply_fn while logging every kernel-entry invocation."""
    calls = []
    originals = {k: getattr(sp, k) for k in KERNELS}

    def wrap(name, fn):
        def rec(*a, **kw):
            calls.append((name, a, dict(kw)))
            return fn(*a, **kw)
        return rec

    try:
        for k in KERNELS:
            patched = wrap(k, originals[k])
            setattr(sp, k, patched)
            if hasattr(si, k):          # shuffle_infer did `from ... import`
                setattr(si, k, patched)
        jax.eval_shape(apply_fn, x_spec, t_spec)
    finally:
        for k in KERNELS:
            setattr(sp, k, originals[k])
            if hasattr(si, k):
                setattr(si, k, originals[k])
    return calls


def concretize(obj, rng):
    """Replace tracers/abstract leaves with random concrete arrays."""
    def fix(v):
        if isinstance(v, jax.core.Tracer):
            aval = v.aval
            return jnp.asarray(rng.normal(size=aval.shape) * 0.1, aval.dtype)
        return v
    return jax.tree_util.tree_map(fix, obj)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, nargs=2, default=(256, 96))
    ap.add_argument("--record-only", action="store_true",
                    help="trace + list the kernel calls, skip the TPU replay "
                         "(CPU smoke of the recording machinery)")
    args = ap.parse_args()

    if not args.record_only and jax.default_backend() != "tpu":
        print("ERROR: needs the TPU backend", file=sys.stderr)
        return 2

    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    T = 1000
    H, W = args.img
    unet = ShuffleUNet(T, 256, 1, 1, 64, (1, 2, 4, 8), dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)),
                              None, jnp.zeros((1,), jnp.int32), train=False)
    folded = fold_unet(variables, dtype=jnp.bfloat16)

    x_spec = jax.ShapeDtypeStruct((args.batch, H, W, 1), jnp.bfloat16)
    t_spec = jax.ShapeDtypeStruct((args.batch,), jnp.int32)
    calls = record_calls(
        lambda x, t: apply_folded(folded, x, t, use_pallas="chain",
                                  dtype=jnp.bfloat16), x_spec, t_spec)
    print(f"recorded {len(calls)} kernel calls from the chain-mode forward",
          flush=True)
    if args.record_only:
        for i, (name, a, kw) in enumerate(calls):
            shapes = [list(v.shape) for v in a
                      if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 3]
            print(f"[{i}] {name} {shapes[:2]}", flush=True)
        return 0

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    n_fail = 0
    for i, (name, a, kw) in enumerate(calls):
        a_c = jax.device_put(concretize(a, rng), dev)
        kw_c = jax.device_put(concretize(kw, rng), dev)
        fn = getattr(sp, name)
        shapes = [list(v.shape) for v in a
                  if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 3]
        tag = f"[{i}] {name} {shapes[:2]}"
        # jit over ONLY the array leaves; static python values (g, inj_after,
        # interpret, None) stay closed over so kernel-side `is None` / int
        # logic sees real values, not tracers
        leaves, treedef = jax.tree_util.tree_flatten((a_c, kw_c))
        is_arr = [isinstance(l, (jax.Array, np.ndarray)) for l in leaves]
        arr_leaves = [l for l, f in zip(leaves, is_arr) if f]

        def run(arrs, _leaves=leaves, _is_arr=is_arr, _td=treedef, _fn=fn):
            it = iter(arrs)
            full = [next(it) if f else l for l, f in zip(_leaves, _is_arr)]
            aa, kk = jax.tree_util.tree_unflatten(_td, full)
            return _fn(*aa, **kk)

        try:
            out = jax.jit(run)(arr_leaves)
            flat = jax.tree_util.tree_leaves(out)
            s = float(np.asarray(jnp.sum(flat[0].astype(jnp.float32))))
            print(f"ok    {tag}  (sum {s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            msg = f"{type(e).__name__}: {e}".replace("\n", " ")[:300]
            print(f"FAIL  {tag}  {msg}", flush=True)
    print(f"{n_fail} failing kernel call(s)", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
