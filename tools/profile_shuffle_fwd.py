"""Per-component timings of the BN-folded ShuffleUNet inference forward at
the bench shape ([16, 256, 96, 1], base 64, mults (1,2,4,8)) — spec vs
packed unit chains, plus the non-unit glue (downsample, resize, time-mlp).

Usage: python tools/profile_shuffle_fwd.py [iters]
"""
import sys, os; _here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here)); sys.path.insert(0, _here)  # repo root + tools/ (robust under -m / import)
import time
import numpy as np
import jax, jax.numpy as jnp

from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet
from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                           fold_unet, _chain)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30

T = 1000
unet = ShuffleUNet(T, 256, 1, 1, 64, (1, 2, 4, 8), dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 96, 1)),
                          None, jnp.zeros((1,), jnp.int32), train=False)
variables = jax.device_put(variables, jax.devices()[0])
folded = fold_unet(variables, dtype=jnp.bfloat16)
x0 = jax.random.normal(jax.random.PRNGKey(0), (16, 256, 96, 1))
t = jnp.full((16,), 500, jnp.int32)


def timeit(tag, fn, x):
    def body(c, _):
        o = fn(c)
        # keep shape for chaining: pad/slice channels to match input
        if o.shape != c.shape:
            o = jnp.zeros_like(c) + o.mean()
        return o.astype(c.dtype), None
    f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=ITERS)[0])
    float(np.asarray(f(x)).sum())
    t0 = time.perf_counter()
    out = f(x)
    float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {tag:34s} {dt * 1e3:7.3f} ms", flush=True)
    return dt


def health():
    # canonical scalar-readback probe (tools/_tpu_probe.py) — the old inline
    # probe timed a 32 MB readback, bounding its reading by tunnel bandwidth
    from _tpu_probe import DEFAULT_BAR_TFLOPS, measure
    tf = measure()
    print(f"health: {tf:.0f} TFLOP/s "
          f"({'OK' if tf > DEFAULT_BAR_TFLOPS else 'DEGRADED — invalid numbers'})",
          flush=True)
    return tf


def main():
    health()
    # whole forward
    for mode, tag in [(False, "full fwd (spec)"),
                      ("packed", "full fwd (packed units)")]:
        timeit(tag, lambda c, m=mode: apply_folded(
            folded, c[..., :1], t, use_pallas=m,
            dtype=jnp.bfloat16).astype(c.dtype) + c * 0, x0)

    # per-stage unit chains at their real shapes (base 64, mults (1,2,4,8):
    # dims [64,64,128,256,512]; enc_i units run at cin of stage i)
    shapes = {"enc0": (16, 256, 96, 64), "enc1": (16, 128, 48, 64),
              "enc2": (16, 64, 24, 128), "enc3": (16, 32, 12, 256)}
    for blk in folded["enc"]:
        n = blk["name"]
        xs = jax.random.normal(jax.random.PRNGKey(1), shapes[n], jnp.bfloat16)
        for mode in (False, "packed"):
            timeit(f"{n} units x4 ({'packed' if mode else 'spec'})",
                   lambda c, u=blk["units"], m=mode: _chain(c, u[:4], m), xs)
    xs = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 6, 512),
                           jnp.bfloat16)
    for mode in (False, "packed"):
        timeit(f"mid x3 ({'packed' if mode else 'spec'})",
               lambda c, m=mode: _chain(c, folded["mid"], m), xs)


if __name__ == "__main__":
    main()
