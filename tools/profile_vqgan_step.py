#!/usr/bin/env python
"""Decompose the flagship MNIST VQGAN train step into timed subcomponents.

Readback-honest timing (CLAUDE.md: block_until_ready does not fence on the
axon backend): every measurement syncs by pulling one scalar to host; the
~0.7 ms tunnel RTT is amortized over ITERS queued iterations.

Usage: python tools/profile_vqgan_step.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 200
IMG = 28
ITERS = 20


def timed(fn, *args, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(x.reshape(-1)[0])) if hasattr(x, "reshape") else x,
            jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import (
        VQGANVQVAEWorker, _replace_leaf, _LAST_DECODER_KERNEL)
    from vq_vae_gan_diffusion_tpu.models import VQVAE
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = load_config("configs/training_config_mnist.yml")
    cfg = cfg.replace_path("trainer.log_dir", "/tmp/vqgd_prof")
    w = VQGANVQVAEWorker(cfg, "/tmp/vqgd_prof/run", debug=True, dtype=jnp.bfloat16)
    state = w.init_state()
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (BATCH, IMG, IMG, 1), jnp.float32)
    model, disc, lpips = w.model, w.disc, w.lpips
    lp = w.lpips_params

    print(f"full train_step: {timed(w.train_step, state, imgs, rng):8.2f} ms")

    # vqvae forward only
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
    print(f"vqvae fwd:       {timed(fwd, state.vqvae_params, imgs):8.2f} ms")

    # vqvae fwd+bwd (recon L1 only)
    def recon_loss(p, x):
        d, _, q = model.apply({"params": p}, x)
        return jnp.mean(jnp.abs(d - x)) + q
    g1 = jax.jit(jax.grad(recon_loss))
    print(f"vqvae fwd+bwd:   {timed(g1, state.vqvae_params, imgs):8.2f} ms")

    # lpips fwd
    lpf = jax.jit(lambda lp_, a, b: jnp.mean(lpips.apply({"params": lp_}, a, b)))
    print(f"lpips fwd:       {timed(lpf, lp, imgs, imgs):8.2f} ms")

    # lpips fwd+bwd wrt second arg
    lpg = jax.jit(jax.grad(lambda b, lp_, a: jnp.mean(lpips.apply({"params": lp_}, a, b))))
    print(f"lpips fwd+bwd:   {timed(lpg, imgs, lp, imgs):8.2f} ms")

    # disc fwd
    dfw = jax.jit(lambda p, s, x: jnp.mean(
        disc.apply({"params": p, "batch_stats": s}, x, train=True,
                   mutable=["batch_stats"])[0]))
    print(f"disc fwd:        {timed(dfw, state.disc_params, state.disc_batch_stats, imgs):8.2f} ms")

    # adaptive-lambda block alone (encode + two tail VJPs)
    def lam_block(vq_params, disc_params, stats, x, lp_):
        z_q = jax.lax.stop_gradient(
            model.apply({"params": vq_params}, x, method=VQVAE.encode)[0])

        def tail(w_last, which):
            p2 = _replace_leaf(vq_params, _LAST_DECODER_KERNEL, w_last)
            dec = model.apply({"params": p2}, z_q, method=VQVAE.decode)
            if which == 0:
                p = lpips.apply({"params": lp_}, x, dec)
                return jnp.mean(p + jnp.abs(x - dec))
            fake = disc.apply({"params": disc_params, "batch_stats": stats},
                              dec, train=True, mutable=["batch_stats"])[0]
            return -jnp.mean(fake)

        w_last = vq_params["decoder"]["conv_out"]["kernel"]
        g_prl = jax.grad(tail)(w_last, 0)
        g_gan = jax.grad(tail)(w_last, 1)
        return jnp.linalg.norm(g_prl.reshape(-1)) / (jnp.linalg.norm(g_gan.reshape(-1)) + 1e-4)
    lb = jax.jit(lam_block)
    print(f"lambda block:    {timed(lb, state.vqvae_params, state.disc_params, state.disc_batch_stats, imgs, lp):8.2f} ms")

    # encode only
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method=VQVAE.encode)[0])
    print(f"vqvae encode:    {timed(enc, state.vqvae_params, imgs):8.2f} ms")

    # optimizer update only
    def opt_only(state, g):
        up, no = w.opt_g.update(g, state.opt_state_g, state.vqvae_params)
        import optax
        return optax.apply_updates(state.vqvae_params, up)
    go = jax.jit(opt_only)
    gz = jax.tree_util.tree_map(jnp.zeros_like, state.vqvae_params)
    print(f"adam update:     {timed(go, state, gz):8.2f} ms")

    try:
        comp = w._train_step.lower(state, imgs, rng, lp).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(f"cost_analysis: flops={ca.get('flops', 0)/1e9:.1f} GF, "
              f"bytes={ca.get('bytes accessed', 0)/1e6:.0f} MB")
    except Exception as e:
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
