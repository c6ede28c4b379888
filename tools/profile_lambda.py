#!/usr/bin/env python
"""Attribute the adaptive-λ machinery's cost in the VQGAN mnist step.

VERDICT r4 weak-6: the 28² step sits at 35.4% MFU with a named-but-unmeasured
residual — the λ path runs a full extra encode plus (pre-r5) two separate
decoder-tail VJPs per step (train/vqgan_worker.py). This times the SAME
multi-step dispatch under three lambda_mode settings:

  shared  one tail forward + two cotangent pulls via jax.vjp
  grad2   two jax.grad calls re-running the tail forward (the DEFAULT —
          measured fastest: XLA CSEs the duplicate tail forwards)
  off     λ pinned to 1.0 — no extra encode, no tail VJPs at all

(shared − off) / (grad2 − off) = the λ machinery's cost under each shape.
Measured 2026-08-21 (baselines/lambda_attribution.json): grad2 11.450,
shared 12.511, off 11.206 ms/step — λ costs 0.24 ms in the grad2 shape and
the shared-vjp "optimization" is 1.06 ms slower, so grad2 stays the default.
Reference λ: network/vqvae/vqvae.py:155-180.

Usage: python tools/profile_lambda.py [--iters 50] [--windows 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, IMG = 200, 28


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--out", default="baselines/lambda_attribution.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    rows = {}
    for mode in ("shared", "grad2", "off"):
        cfg = load_config("configs/training_config_mnist.yml")
        cfg = cfg.replace_path("trainer.log_dir", "/tmp/vqgd_lam")
        cfg = cfg.replace_path("trainer.vqvae.lambda_mode", mode)
        w = VQGANVQVAEWorker(cfg, f"/tmp/vqgd_lam/{mode}", debug=True,
                             dtype=jnp.bfloat16)
        state = w.init_state()
        imgs = jax.random.normal(jax.random.PRNGKey(0), (BATCH, IMG, IMG, 1))
        batches = jnp.broadcast_to(imgs, (args.iters,) + imgs.shape)
        rngs = jax.random.split(jax.random.PRNGKey(1), args.iters)
        st, m = w.train_multi_step(state, batches, rngs)
        float(np.asarray(m["vq_loss"]))
        st, m = w.train_multi_step(st, batches, rngs)
        float(np.asarray(m["vq_loss"]))
        times = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            st, m = w.train_multi_step(st, batches, rngs)
            float(np.asarray(m["vq_loss"]))
            times.append(time.perf_counter() - t0)
        best = min(times)
        rows[mode] = {"ms_per_step": round(best / args.iters * 1e3, 3),
                      "images_per_sec": round(BATCH * args.iters / best, 1)}
        print(mode, rows[mode], flush=True)
        del w, state, st

    ms = {k: v["ms_per_step"] for k, v in rows.items()}
    rows["attribution_ms"] = {
        "lambda_total_cost": round(ms["shared"] - ms["off"], 3),
        "saved_by_shared_vjp": round(ms["grad2"] - ms["shared"], 3),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
