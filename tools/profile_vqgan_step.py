"""Ablation timings for the VQGAN mnist train step (bench.py workload).

Times scan-wrapped variants of the step's components, with the scan carry
perturbing the input image each iteration (otherwise XLA hoists the whole
loop-invariant body out of the scan) and one final host readback
(block_until_ready does not fence on axon).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from vq_vae_gan_diffusion_tpu.config import load_config
from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
from vq_vae_gan_diffusion_tpu.models import VQVAE

ITERS = 50
cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                               "configs", "training_config_mnist.yml"))
cfg = cfg.replace_path("trainer.log_dir", "/tmp/vqgd_prof")
worker = VQGANVQVAEWorker(cfg, "/tmp/vqgd_prof/run", debug=True,
                          dtype=jnp.bfloat16)
state = worker.init_state()
imgs = jax.random.normal(jax.random.PRNGKey(0), (200, 28, 28, 1), jnp.float32)
model, disc, lpips = worker.model, worker.disc, worker.lpips
lp = worker.lpips_params
p = state.vqvae_params
dp_, st_ = state.disc_params, state.disc_batch_stats


def timeit(tag, fn):
    """fn(x) -> scalar; the carry perturbs x so nothing is loop-invariant."""
    def body(c, _):
        return fn(imgs + c * 1e-20).astype(jnp.float32), None
    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                     length=ITERS)[0])
    float(np.asarray(f()))  # compile
    t0 = time.perf_counter()
    out = f()
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag:34s} {dt:7.3f} ms/iter", flush=True)
    return dt


def gsum(tree):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32) ** 2), tree, 0.0)


timeit("vqvae fwd", lambda x: jnp.mean(
    model.apply({"params": p}, x)[0].astype(jnp.float32)))


def l1_loss(pp, x):
    dec, _, ql = model.apply({"params": pp}, x)
    return jnp.mean(jnp.abs(x - dec)) + ql


timeit("vqvae grad (L1+q)", lambda x: gsum(jax.grad(l1_loss)(p, x)))

timeit("lpips fwd", lambda x: jnp.mean(
    lpips.apply({"params": lp}, x, x * 0.9).astype(jnp.float32)))


def lp_loss(pp, x):
    dec, _, ql = model.apply({"params": pp}, x)
    return (jnp.mean(lpips.apply({"params": lp}, x, dec))
            + jnp.mean(jnp.abs(x - dec)) + ql)


timeit("vqvae grad (+lpips)", lambda x: gsum(jax.grad(lp_loss)(p, x)))

timeit("disc fwd", lambda x: jnp.mean(disc.apply(
    {"params": dp_, "batch_stats": st_}, x, train=True,
    mutable=["batch_stats"])[0].astype(jnp.float32)))


def lam_block(x):
    z_q = jax.lax.stop_gradient(model.apply({"params": p}, x,
                                            method=VQVAE.encode)[0])
    w_last = p["decoder"]["conv_out"]["kernel"]

    def tail(w, which):
        p2 = {**p, "decoder": {**p["decoder"],
                               "conv_out": {**p["decoder"]["conv_out"],
                                            "kernel": w}}}
        dec = model.apply({"params": p2}, z_q, method=VQVAE.decode)
        if which == 0:
            return jnp.mean(lpips.apply({"params": lp}, x, dec)) + \
                jnp.mean(jnp.abs(x - dec))
        fake = disc.apply({"params": dp_, "batch_stats": st_}, dec, train=True,
                          mutable=["batch_stats"])[0]
        return -jnp.mean(fake)
    g1 = jax.grad(tail)(w_last, 0)
    g2 = jax.grad(tail)(w_last, 1)
    return jnp.linalg.norm(g1.reshape(-1)) / (jnp.linalg.norm(g2.reshape(-1))
                                              + 1e-4)


timeit("lambda block", lam_block)


def full_gan_losses(x):
    """total_loss grads exactly as the step computes them (no λ block)."""
    def total(pp, dd):
        dec, _, ql = model.apply({"params": pp}, x)
        prl = (jnp.mean(lpips.apply({"params": lp}, x, dec))
               + jnp.mean(jnp.abs(x - dec)))
        fake_g = disc.apply({"params": jax.lax.stop_gradient(dd),
                             "batch_stats": st_}, dec, train=True,
                            mutable=["batch_stats"])[0]
        g_loss = -jnp.mean(fake_g)
        real, upd = disc.apply({"params": dd, "batch_stats": st_}, x,
                               train=True, mutable=["batch_stats"])
        fake_d, _ = disc.apply({"params": dd, "batch_stats":
                                upd["batch_stats"]}, dec, train=True,
                               mutable=["batch_stats"])
        d_loss = (jnp.mean(jax.nn.relu(1.0 - real))
                  + jnp.mean(jax.nn.relu(1.0 + fake_d))) * 0.5
        return prl + ql + 0.1 * g_loss + d_loss
    gg, gd = jax.grad(total, argnums=(0, 1))(p, dp_)
    return gsum(gg) + gsum(gd)


timeit("G+D grads (no lambda)", full_gan_losses)

# full train step with a REAL loop-carried state (what bench.py measures)
batches = jnp.broadcast_to(imgs, (ITERS,) + imgs.shape)
rngs = jax.random.split(jax.random.PRNGKey(7), ITERS)
st2, m = worker.train_multi_step(state, batches, rngs)
float(np.asarray(m["vq_loss"]))
t0 = time.perf_counter()
st2, m = worker.train_multi_step(state, batches, rngs)
float(np.asarray(m["vq_loss"]))
print(f"{'full step (train_multi_step)':34s} "
      f"{(time.perf_counter() - t0) / ITERS * 1e3:7.3f} ms/iter", flush=True)
