"""Micro-bench: ShuffleNet ResidualBottleneck inference variants on TPU.

The DDPM chain's cost is dominated by full-res bottleneck units, which are
HBM-traffic bound. The current production path (`reference_bottleneck`,
shift-add depthwise) re-reads the padded activation 9x inside the XLA loop
fusion (TPU has no cache between fusion input streams), so its traffic is
~5x the tensor size. Variants here test cheaper formulations; run at the
stage shapes from BENCHMARKS.md.

Usage: python tools/bench_bottleneck.py [iters]
"""
import sys, os; _here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here)); sys.path.insert(0, _here)  # repo root + tools/ (robust under -m / import)
import time
import numpy as np
import jax, jax.numpy as jnp

from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
    reference_bottleneck, fused_bottleneck, fold_bottleneck_params_packed,
    fused_bottleneck_packed, pack_images, unpack_images, pick_group)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def _silu(x):
    return x * jax.nn.sigmoid(x)


def make_params(key, ch, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 5)
    return {
        "k1": jax.random.normal(ks[0], (3, 3, ch), dtype) * 0.1,
        "b1": jnp.zeros((1, ch), dtype),
        "w1": jax.random.normal(ks[1], (ch, ch), dtype) * 0.1,
        "c1": jnp.zeros((1, ch), dtype),
        "w2": jax.random.normal(ks[2], (ch, ch), dtype) * 0.1,
        "c2": jnp.zeros((1, ch), dtype),
        "k2": jax.random.normal(ks[3], (3, 3, ch), dtype) * 0.1,
        "b2": jnp.zeros((1, ch), dtype),
        "w3": jax.random.normal(ks[4], (ch, ch), dtype) * 0.1,
        "c3": jnp.zeros((1, ch), dtype),
    }


def conv_bottleneck(x, p, acc=jnp.float32):
    """Same math via lax.conv depthwise (one VMEM-tiled read instead of 9
    re-read streams) + pointwise via einsum."""
    ch = x.shape[-1] // 2
    dn = ("NHWC", "HWIO", "NHWC")

    def dw(v, k, b):
        return jax.lax.conv_general_dilated(
            v, k[:, :, None, :], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, feature_group_count=ch) + b

    x1, x2 = x[..., :ch], x[..., ch:]
    t1 = dw(x1, p["k1"], p["b1"])
    t1 = _silu(jnp.einsum("bhwc,cd->bhwd", t1, p["w1"],
                          preferred_element_type=acc) + p["c1"]).astype(x.dtype)
    t2 = _silu(jnp.einsum("bhwc,cd->bhwd", x2, p["w2"],
                          preferred_element_type=acc) + p["c2"]).astype(x.dtype)
    t2 = dw(t2, p["k2"], p["b2"])
    t2 = _silu(jnp.einsum("bhwc,cd->bhwd", t2, p["w3"],
                          preferred_element_type=acc) + p["c3"]).astype(x.dtype)
    return jnp.stack([t1, t2], axis=-1).reshape(
        x.shape[0], x.shape[1], x.shape[2], -1)


def conv_pw_bottleneck(x, p):
    """Depthwise AND pointwise via lax.conv (pointwise as 1x1 conv so XLA can
    fuse the SiLU epilogue into the conv output)."""
    ch = x.shape[-1] // 2
    dn = ("NHWC", "HWIO", "NHWC")

    def dw(v, k, b):
        return jax.lax.conv_general_dilated(
            v, k[:, :, None, :], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, feature_group_count=ch) + b

    def pw(v, w, c):
        return jax.lax.conv_general_dilated(
            v, w[None, None], (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=dn) + c

    x1, x2 = x[..., :ch], x[..., ch:]
    t1 = _silu(pw(dw(x1, p["k1"], p["b1"]), p["w1"], p["c1"])).astype(x.dtype)
    t2 = _silu(pw(x2, p["w2"], p["c2"])).astype(x.dtype)
    t2 = dw(t2, p["k2"], p["b2"])
    t2 = _silu(pw(t2, p["w3"], p["c3"])).astype(x.dtype)
    return jnp.stack([t1, t2], axis=-1).reshape(
        x.shape[0], x.shape[1], x.shape[2], -1)


def timeit(tag, fn, x, p):
    out_shape = jax.eval_shape(lambda c: fn(c, p), x).shape
    if out_shape == x.shape:
        def body(c, _):
            return fn(c, p).astype(c.dtype), None
    else:
        # shape-changing fn (e.g. encoder block with stride-2 downsample):
        # keep the carry input-shaped and feed a scalar of the output back
        # into it so the loop body can't be hoisted as loop-invariant. The
        # feedback is damped 1e-3 so the benchmarked input distribution does
        # not random-walk away over ITERS iterations (advisor r2); 1e-3 is
        # large enough that XLA cannot constant-fold the data dependence.
        def body(c, _):
            y = fn(c, p)
            return c + (1e-3 * jnp.mean(y)).astype(c.dtype), None
    f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=ITERS)[0])
    float(np.asarray(f(x)).sum())  # compile + warm
    t0 = time.perf_counter()
    out = f(x)
    float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {tag:28s} {dt * 1e3:7.3f} ms", flush=True)
    return dt


def main():
    # health banner: canonical scalar-readback probe (tools/_tpu_probe.py)
    from _tpu_probe import DEFAULT_BAR_TFLOPS, measure
    tf = measure()
    print(f"health: matmul chain {tf:.0f} TFLOP/s "
          f"({'OK' if tf > DEFAULT_BAR_TFLOPS else 'DEGRADED — numbers below are invalid'})",
          flush=True)

    shapes = [(16, 256, 96, 64), (16, 128, 48, 128), (16, 64, 24, 256),
              (16, 32, 16, 512)]
    for (b, h, w, c) in shapes:
        print(f"[{b},{h},{w},{c}]")
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c),
                              jnp.bfloat16)
        p = make_params(jax.random.PRNGKey(1), c // 2)
        ch = c // 2
        g = pick_group(b, ch, ch)
        pp = fold_bottleneck_params_packed(p, g)

        def packed(x, p_, g=g, pp=pp):
            y1, y2 = fused_bottleneck_packed(
                pack_images(x[..., :x.shape[-1] // 2], g),
                pack_images(x[..., x.shape[-1] // 2:], g), pp)
            return jnp.concatenate([unpack_images(y1, g),
                                    unpack_images(y2, g)], -1)

        def packed_resident(xr, p_, pp=pp):
            """Steady-state cost when activations STAY packed between units
            (the chain path): kernel only, no pack/unpack."""
            lh = xr.shape[-1] // 2
            y1, y2 = fused_bottleneck_packed(xr[..., :lh], xr[..., lh:], pp)
            return jnp.concatenate([y1, y2], -1)

        xp_res = jnp.concatenate(
            [pack_images(x[..., :ch], g), pack_images(x[..., ch:], g)], -1)

        ref = None
        for tag, fn, x0 in [
                ("shift-add spec (prod)", reference_bottleneck, x),
                ("lax.conv dw", conv_bottleneck, x),
                ("lax.conv dw+pw", conv_pw_bottleneck, x),
                ("pallas fused", lambda x, p: fused_bottleneck(x, p), x),
                (f"packed g={g} (+pack/unpack)", packed, x),
                (f"packed g={g} resident", packed_resident, xp_res)]:
            try:
                dt = timeit(tag, fn, x0, p)
            except Exception as e:  # noqa
                print(f"  {tag:28s} FAILED: {type(e).__name__}: {e}"[:120],
                      flush=True)
                continue
            if ref is None:
                ref = dt
        # 4-unit chain (one encoder stage): per-unit HBM round trips, spec vs
        # packed-resident (the v3 whole-chain kernel family was deleted in
        # round 4 — it never compiled on hardware; see BENCHMARKS.md)
        units = [make_params(jax.random.fold_in(jax.random.PRNGKey(2), i),
                             ch) for i in range(4)]
        pus = [fold_bottleneck_params_packed(u, g) for u in units]

        def spec_x4(x, _):
            for u in units:
                x = reference_bottleneck(x, u)
            return x

        def packed_x4_resident(xr, _):
            lh = xr.shape[-1] // 2
            a, b2 = xr[..., :lh], xr[..., lh:]
            for pu in pus:
                a, b2 = fused_bottleneck_packed(a, b2, pu)
            return jnp.concatenate([a, b2], -1)

        for tag, fn, x0 in [
                ("chain: spec x4", spec_x4, x),
                (f"chain: packed x4 resident", packed_x4_resident, xp_res)]:
            try:
                timeit(tag, fn, x0, p)
            except Exception as e:  # noqa
                print(f"  {tag:28s} FAILED: {type(e).__name__}: {e}"[:120],
                      flush=True)

        # numerics cross-check at this shape
        y0 = reference_bottleneck(x, p)
        for tag, fn in [("conv dw", conv_bottleneck),
                        ("conv dw+pw", conv_pw_bottleneck)]:
            err = float(jnp.max(jnp.abs((fn(x, p) - y0).astype(jnp.float32))))
            print(f"  max|Δ| vs spec ({tag}): {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
