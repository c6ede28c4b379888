"""256² VQGAN step: component ablation + dtype/remat variants (VERDICT r2 #7).

The flagship high-res number (BENCHMARKS.md `vqgan_oxford256_b20`, 171.8 ms
at 50-75% MXU on a v5e) is the one headline with claimed headroom. This tool
locates the time (forward / L1 backward / LPIPS / λ double-VJP / D pass) at
the oxford shape and A/Bs the candidate step variants:

  - bf16 vs f32 module dtype (the shipped step is bf16);
  - rematerialized VQVAE forward (jax.checkpoint around the model apply —
    trades one extra forward for O(depth) less activation HBM; wins only if
    the backward is HBM-bound);

so the default can be flipped on a measurement, not a guess. Run on a HEALTHY
tunnel (tools/tpu_recovery_queue.sh runs it queued); numbers from a degraded
window are mirages.

Reference hot loop: /root/reference/worker/vqganVqvaeWorker.py:163-254.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

# CPU smoke runs (VQG256_PLATFORM=cpu): config.update right after import is
# the ONLY reliable CPU switch during a full tunnel wedge — env-var hints are
# consumed before sitecustomize preloads jax, and jax.devices() would hang in
# plugin discovery (CLAUDE.md)
if os.environ.get("VQG256_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VQG256_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from vq_vae_gan_diffusion_tpu.config import load_config
from vq_vae_gan_diffusion_tpu.models import VQVAE
from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

# env overrides let a CPU smoke-run validate the script without 256² compiles
BATCH = int(os.environ.get("VQG256_BATCH", 20))
IMG = int(os.environ.get("VQG256_IMG", 256))
CH = 3
ITERS = int(os.environ.get("VQG256_ITERS", 20))

cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                               "configs", "training_config_small.yml"))
cfg = (cfg.replace_path("trainer.log_dir", "/tmp/vqgd_prof256")
          .replace_path("architecture.model_name", "vqgan")
          .replace_path("dataset.img_size.Oxford102Flower", IMG))
imgs = jax.random.normal(jax.random.PRNGKey(0), (BATCH, IMG, IMG, CH),
                         jnp.float32)


def timeit(tag, fn, *ops, x=imgs):
    """Time fn(*ops, x) amortized over a scan. ``ops`` (param trees) are jit
    ARGUMENTS — closing over them bakes them into the HLO as constants, and at
    the 256² shape the serialized program then exceeds the axon relay's
    request-size cap (HTTP 413 killed the round-3 queue run of this script)."""
    def f_inner(ops_, x_):
        def body(c, _):
            return fn(*ops_, x_ + c * 1e-20).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[0]
    f = jax.jit(f_inner)
    float(np.asarray(f(ops, x)))
    float(np.asarray(f(ops, x)))  # 2nd warm-up: committed-arg recompile
    t0 = time.perf_counter()
    out = f(ops, x)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag:36s} {dt:8.3f} ms/iter", flush=True)
    return dt


def gsum(tree):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32) ** 2), tree, 0.0)


def step_time(worker, state, tag):
    """train_multi_step (the bench path) ms/step with one final readback."""
    batches = jnp.broadcast_to(imgs, (ITERS,) + imgs.shape)
    rngs = jax.random.split(jax.random.PRNGKey(7), ITERS)
    # the step donates its input state — thread the returned one throughout
    st2, m = worker.train_multi_step(state, batches, rngs)
    float(np.asarray(m["vq_loss"]))
    st2, m = worker.train_multi_step(st2, batches, rngs)
    float(np.asarray(m["vq_loss"]))  # 2nd warm-up: committed-arg recompile
    t0 = time.perf_counter()
    st2, m = worker.train_multi_step(st2, batches, rngs)
    float(np.asarray(m["vq_loss"]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag:36s} {dt:8.3f} ms/step "
          f"({BATCH / dt * 1e3:.1f} img/s)", flush=True)
    return dt


# CPU smokes force f32 (VQG256_DTYPE=float32): XLA:CPU emulates bf16 ~10x
# slower, and the smoke only validates that every section traces and runs
DTYPE = jnp.dtype(os.environ.get("VQG256_DTYPE", "bfloat16"))
print(f"== components ({DTYPE} modules, batch {BATCH} @ {IMG}²·{CH}) ==")
worker = VQGANVQVAEWorker(cfg, "/tmp/vqgd_prof256/run", debug=True,
                          dtype=DTYPE)
state = worker.init_state()
model, disc, lpips = worker.model, worker.disc, worker.lpips
lp, p = worker.lpips_params, state.vqvae_params
dp_, st_ = state.disc_params, state.disc_batch_stats

timeit("vqvae fwd", lambda p_, x: jnp.mean(
    model.apply({"params": p_}, x)[0].astype(jnp.float32)), p)


def l1_loss(pp, x):
    dec, _, ql = model.apply({"params": pp}, x)
    return jnp.mean(jnp.abs(x - dec)) + ql


timeit("vqvae grad (L1+q)", lambda p_, x: gsum(jax.grad(l1_loss)(p_, x)), p)

remat_apply = jax.checkpoint(
    lambda pp, x: model.apply({"params": pp}, x)[::2])  # (dec, q_loss)


def l1_loss_remat(pp, x):
    dec, ql = remat_apply(pp, x)
    return jnp.mean(jnp.abs(x - dec)) + ql


timeit("vqvae grad (L1+q, remat fwd)",
       lambda p_, x: gsum(jax.grad(l1_loss_remat)(p_, x)), p)

timeit("lpips fwd", lambda lp_, x: jnp.mean(
    lpips.apply({"params": lp_}, x, x * 0.9).astype(jnp.float32)), lp)


def lp_loss(pp, lp_, x):
    dec, _, ql = model.apply({"params": pp}, x)
    return (jnp.mean(lpips.apply({"params": lp_}, x, dec))
            + jnp.mean(jnp.abs(x - dec)) + ql)


timeit("vqvae grad (+lpips)",
       lambda p_, lp_, x: gsum(jax.grad(lp_loss)(p_, lp_, x)), p, lp)

timeit("disc fwd", lambda dp2, st2, x: jnp.mean(disc.apply(
    {"params": dp2, "batch_stats": st2}, x, train=True,
    mutable=["batch_stats"])[0].astype(jnp.float32)), dp_, st_)


def lam_block(p_, lp_, dp2, st2, x):
    z_q = jax.lax.stop_gradient(
        model.apply({"params": p_}, x, method=VQVAE.encode)[0])
    w_last = p_["decoder"]["conv_out"]["kernel"]

    def tail(w, which):
        p2 = {**p_, "decoder": {**p_["decoder"],
                                "conv_out": {**p_["decoder"]["conv_out"],
                                             "kernel": w}}}
        dec = model.apply({"params": p2}, z_q, method=VQVAE.decode)
        if which == 0:
            return jnp.mean(lpips.apply({"params": lp_}, x, dec)) + \
                jnp.mean(jnp.abs(x - dec))
        fake = disc.apply({"params": dp2, "batch_stats": st2}, dec,
                          train=True, mutable=["batch_stats"])[0]
        return -jnp.mean(fake)
    g1 = jax.grad(tail)(w_last, 0)
    g2 = jax.grad(tail)(w_last, 1)
    return jnp.linalg.norm(g1.reshape(-1)) / (jnp.linalg.norm(g2.reshape(-1))
                                              + 1e-4)


timeit("lambda block", lam_block, p, lp, dp_, st_)

print("== full step variants ==")
dt_base = step_time(worker, state, f"full step {DTYPE} (shipped)")

if DTYPE != jnp.float32:
    worker32 = VQGANVQVAEWorker(cfg, "/tmp/vqgd_prof256/run32", debug=True,
                                dtype=jnp.float32)
    state32 = worker32.init_state()
    dt_f32 = step_time(worker32, state32, "full step f32")
    print(f"{DTYPE} speedup over f32: {dt_f32 / dt_base:.2f}x", flush=True)
