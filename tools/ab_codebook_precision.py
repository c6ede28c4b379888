#!/usr/bin/env python
"""Quality A/B: exact vs bf16-rounded codebook argmin scores (VERDICT r3 #6).

The Pallas codebook kernel's only measured win is its bf16-scores mode
(844.7 vs 938.5 µs XLA-exact on v5e), which changes argmin numerics: TPU-
default bf16 rounding of the distance matmul operands flips ~0.5% of argmins
vs the true f32 distance. Before any default can flip to rounded scores
(kernel OR `codebook_precision: bf16` on the XLA path — same numerics), the
question is whether those flips change TRAINING, not just single-op outputs.

This A/B trains the same tiny VQVAE twice from the same init/data/rngs —
`codebook_precision: exact` vs `bf16` — and reports per-eval PSNR curves,
final loss, and the argmin agreement rate between the two runs' final
encoders. Training-neutral = curves within run-to-run noise (compare against
the seed-variation column) and no codebook-collapse signature (usage drop).

Runs anywhere (CPU bf16 matmul emulation has the same rounding semantics);
match: reference network/vqvae/submodule/codebook.py:70-82.

Usage: python tools/ab_codebook_precision.py [--steps 192] [--platform cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_side(precision: str, seed: int, args):
    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    cfg = load_config(args.config)
    cfg = (cfg.replace_path("architecture.model_name", "vqvae")
              .replace_path("architecture.vqvae.codebook_precision", precision)
              .replace_path("trainer.vqvae.perceptual_loss_factor", 0.0)
              .replace_path("trainer.log_dir", "/tmp/ab_cb")
              .replace_path("dataset.batch_size.vqvae.mnist", args.batch))
    w = VQGANVQVAEWorker(cfg, f"/tmp/ab_cb/{precision}_{seed}", debug=True,
                         seed=seed)
    state = w.init_state()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from time_to_quality import load_data
    train_np, val_np = load_data(cfg, n_train_batches=24)
    k = 8
    dev = jax.devices()[0]
    train_dev = jax.device_put(jnp.asarray(train_np), dev)
    val = jax.device_put(jnp.asarray(val_np), dev)

    @jax.jit
    def eval_metrics(params):
        rec, idx, _ = w.model.apply({"params": params}, val)
        a = jnp.clip(rec.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
        b = jnp.clip(val.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
        mse = jnp.mean((a - b) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        k_total = w.model.num_codebook_vectors
        usage = jnp.sum(jnp.zeros((k_total,)).at[idx.reshape(-1)].add(1) > 0)
        return psnr, usage, idx

    rng = jax.random.PRNGKey(seed)
    n = len(train_np)
    curve, cursor = [], 0
    steps = 0
    while steps < args.steps:
        chunk = train_dev[cursor:cursor + k] if cursor + k <= n else \
            jnp.concatenate([train_dev[cursor:], train_dev[:k - (n - cursor)]])
        cursor = (cursor + k) % n
        rng, sub = jax.random.split(rng)
        state, m = w.train_multi_step(state, chunk, jax.random.split(sub, k))
        steps += k
        if steps % (4 * k) == 0:
            psnr, usage, _ = eval_metrics(state.vqvae_params)
            curve.append({"step": steps, "psnr": round(float(psnr), 3),
                          "codes_used": int(usage)})
    psnr, usage, idx = eval_metrics(state.vqvae_params)
    return {"precision": precision, "seed": seed, "curve": curve,
            "final_psnr": round(float(psnr), 3),
            "codes_used": int(usage)}, np.asarray(idx)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/training_config_mnist.yml")
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    exact0, idx_e = run_side("exact", 0, args)
    bf0, idx_b = run_side("bf16", 0, args)
    # seed-variation yardstick: exact with a different seed bounds run noise
    exact1, _ = run_side("exact", 1, args)

    agree = float(np.mean(idx_e == idx_b))
    out = {
        "exact_seed0": exact0, "bf16_seed0": bf0, "exact_seed1": exact1,
        "final_val_argmin_agreement": round(agree, 4),
        "psnr_delta_bf16_vs_exact": round(
            bf0["final_psnr"] - exact0["final_psnr"], 3),
        "psnr_delta_seed_noise": round(
            exact1["final_psnr"] - exact0["final_psnr"], 3),
    }
    neutral = (abs(out["psnr_delta_bf16_vs_exact"])
               <= max(2 * abs(out["psnr_delta_seed_noise"]), 0.3)
               and bf0["codes_used"] >= 0.8 * exact0["codes_used"])
    out["training_neutral"] = bool(neutral)
    os.makedirs("zlog", exist_ok=True)
    with open("zlog/ab_codebook_precision.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
