#!/usr/bin/env python
"""Time-to-quality: wall-clock until MNIST-class reconstruction hits a PSNR bar.

The reference's only quality-speed claim is "good reconstruction in ~2-3
minutes" on a GTX 1660 Ti (reference README.md:184-191; BASELINE.md headline).
This harness makes that claim measurable on both sides under ONE protocol:

  train a VQVAE from scratch (same geometry, batch size, optimizer, and data
  on both sides) and report seconds until the held-out reconstruction PSNR
  first crosses ``--psnr-target``.

Sides:
  default   this framework (TPU or ``--platform cpu``), device-side
            ``steps_per_dispatch``-step dispatch loop;
  --torch   the reference's own torch modules imported read-only from
            /root/reference (CPU — the image has no GPU), per-step loop as in
            worker/vqganVqvaeWorker.py.

Both sides train pure L1 + codebook loss (``perceptual_loss_factor`` forced
to 0 here): the reference's LPIPS weights cannot exist in this zero-egress
image, so a perceptual term would train against *different* losses per side.
Data comes from this repo's pipeline (real MNIST when present, deterministic
synthetic fallback otherwise) and is fed to torch as the same NCHW arrays.

Writes ``baselines/time_to_quality_<side>.json`` and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_data(cfg, n_train_batches: int):
    """Materialize [K, B, H, W, C] train batches + one val batch (normalized)."""
    from vq_vae_gan_diffusion_tpu.data.pipeline import load_dataloader
    train_loader, _ = load_dataloader("mnist", "train", config=cfg)
    val_loader, _ = load_dataloader("mnist", "val", config=cfg)
    batches = []
    while len(batches) < n_train_batches:
        for b in train_loader:
            batches.append(np.asarray(b))
            if len(batches) >= n_train_batches:
                break
    val = np.asarray(next(iter(val_loader)))
    return np.stack(batches), val


def run_jax(args) -> dict:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    from vq_vae_gan_diffusion_tpu.utils.eval_metrics import psnr

    enable_compilation_cache()
    cfg = load_config(args.config)
    cfg = cfg.replace_path("architecture.model_name", "vqvae")
    cfg = cfg.replace_path("trainer.vqvae.perceptual_loss_factor", 0.0)
    cfg = cfg.replace_path("trainer.log_dir", "/tmp/ttq")
    if args.batch:
        cfg = cfg.replace_path("dataset.batch_size.vqvae.mnist", args.batch)
    k = int(cfg.trainer.get("steps_per_dispatch", 8) or 8)

    w = VQGANVQVAEWorker(cfg, "/tmp/ttq/run", dtype=jnp.bfloat16
                         if args.bf16 else jnp.float32)
    train_np, val_np = load_data(cfg, n_train_batches=min(args.max_steps, 48))
    state = w.init_state()
    dev = jax.devices()[0]
    val = jax.device_put(val_np, dev)
    recon_fn = jax.jit(lambda p, x: w.model.apply({"params": p}, x)[0])

    def eval_psnr(state):
        rec = recon_fn(state.vqvae_params, val)
        # denormalize (mean/std 0.5) to [0, 1] for a standard PSNR range
        a = np.clip(np.asarray(rec, np.float32) * 0.5 + 0.5, 0, 1)
        b = np.clip(val_np * 0.5 + 0.5, 0, 1)
        return psnr(a, b)

    rng = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    first_dispatch_done = None
    curve, hit, steps, cursor = [], None, 0, 0
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        chunk = train_np[cursor:cursor + k]
        if len(chunk) < k:   # wrap the epoch
            chunk = np.concatenate([chunk, train_np[:k - len(chunk)]])
        cursor = (cursor + k) % len(train_np)
        rng, sub = jax.random.split(rng)
        rngs = jax.random.split(sub, k)
        state, m = w.train_multi_step(state,
                                      jax.device_put(chunk, dev), rngs)
        steps += k
        if first_dispatch_done is None:
            float(np.asarray(m["vq_loss"]))   # sync: compile boundary
            first_dispatch_done = time.perf_counter() - t0
        if (steps // k) % args.eval_every == 0:
            p = eval_psnr(state)
            el = time.perf_counter() - t0
            curve.append({"step": steps, "seconds": round(el, 2),
                          "psnr": round(p, 2)})
            if args.verbose:
                print(f"  step {steps} t={el:.1f}s psnr={p:.2f}",
                      file=sys.stderr, flush=True)
            if hit is None and p >= args.psnr_target:
                hit = {"seconds_to_target": round(el, 2),
                       "seconds_excl_compile": round(el - first_dispatch_done, 2),
                       "steps": steps}
                break
    import jax as _j
    return {"side": "jax", "backend": _j.default_backend(),
            "psnr_target": args.psnr_target, "batch": int(train_np.shape[1]),
            "compile_seconds": round(first_dispatch_done or 0.0, 2),
            **(hit or {"seconds_to_target": None,
                       "final_psnr": curve[-1]["psnr"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


def run_torch(args) -> dict:
    """Reference torch modules (read-only import), same protocol/geometry."""
    REF = "/root/reference"
    if not os.path.isdir(REF):
        raise SystemExit("reference not mounted")
    sys.path.insert(0, REF)
    import torch

    from network.common.decoder import Decoder        # reference modules
    from network.common.encoder import Encoder
    from network.vqvae.submodule.codebook import CodeBook

    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.utils.eval_metrics import psnr

    cfg = load_config(args.config)
    cfg = cfg.replace_path("architecture.model_name", "vqvae")
    if args.batch:
        cfg = cfg.replace_path("dataset.batch_size.vqvae.mnist", args.batch)
    a = cfg.architecture.vqvae
    tr = cfg.trainer.vqvae
    img = int(cfg.dataset.img_size["mnist"])
    ch = int(cfg.dataset.img_channels["mnist"])
    torch.manual_seed(args.seed)
    enc = Encoder(img_channels=ch, image_size=img,
                  latent_channels=int(a.latent_channels),
                  intermediate_channels=list(a.intermediate_channels),
                  num_residual_blocks=int(a.num_residual_blocks_encoder),
                  attention_resolution=list(a.attention_resolution))
    dec = Decoder(img_channels=ch, latent_channels=int(a.latent_channels),
                  latent_size=int(a.latent_size),
                  intermediate_channels=list(a.intermediate_channels),
                  num_residual_blocks=int(a.num_residual_blocks_decoder),
                  attention_resolution=list(a.attention_resolution))
    cb = CodeBook(num_codebook_vectors=int(a.num_codebook_vectors),
                  latent_dim=int(a.latent_channels))
    quant = torch.nn.Conv2d(int(a.latent_channels), int(a.latent_channels), 1)
    post = torch.nn.Conv2d(int(a.latent_channels), int(a.latent_channels), 1)
    params = (list(enc.parameters()) + list(dec.parameters()) +
              list(cb.parameters()) + list(quant.parameters()) +
              list(post.parameters()))
    opt = torch.optim.Adam(params, lr=float(tr.learning_rate),
                           betas=(float(tr.beta1), float(tr.beta2)), eps=1e-8)

    train_np, val_np = load_data(cfg, n_train_batches=min(args.max_steps, 48))
    # NHWC -> NCHW for torch
    train_t = torch.from_numpy(np.transpose(train_np, (0, 1, 4, 2, 3)))
    val_t = torch.from_numpy(np.transpose(val_np, (0, 3, 1, 2)))
    rec_factor = float(tr.rec_loss_factor)

    def eval_psnr():
        with torch.no_grad():
            rec = dec(post(cb(quant(enc(val_t)))[0]))
        a_ = np.clip(rec.numpy() * 0.5 + 0.5, 0, 1)
        b_ = np.clip(val_t.numpy() * 0.5 + 0.5, 0, 1)
        return psnr(a_, b_)

    k = int(cfg.trainer.get("steps_per_dispatch", 8) or 8)
    t0 = time.perf_counter()
    curve, hit, steps = [], None, 0
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        imgs = train_t[steps % len(train_t)]
        z, _, q_loss = cb(quant(enc(imgs)))
        decoded = dec(post(z))
        loss = rec_factor * torch.abs(imgs - decoded).mean() + q_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        steps += 1
        if steps % (args.eval_every * k) == 0:
            p = eval_psnr()
            el = time.perf_counter() - t0
            curve.append({"step": steps, "seconds": round(el, 2),
                          "psnr": round(p, 2)})
            if args.verbose:
                print(f"  step {steps} t={el:.1f}s psnr={p:.2f}",
                      file=sys.stderr, flush=True)
            if hit is None and p >= args.psnr_target:
                hit = {"seconds_to_target": round(el, 2),
                       "seconds_excl_compile": round(el, 2), "steps": steps}
                break
    return {"side": "torch_reference_cpu", "backend": "cpu",
            "psnr_target": args.psnr_target, "batch": int(train_np.shape[1]),
            "compile_seconds": 0.0,
            **(hit or {"seconds_to_target": None,
                       "final_psnr": curve[-1]["psnr"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="configs/training_config_mnist.yml")
    ap.add_argument("--psnr-target", type=float, default=20.0)
    ap.add_argument("--max-seconds", type=float, default=900.0)
    ap.add_argument("--max-steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=4,
                    help="evaluate every N dispatches (N*steps_per_dispatch steps)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=None,
                    help="override the config batch size (CPU smokes)")
    ap.add_argument("--torch", action="store_true",
                    help="run the reference's torch modules instead")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    res = run_torch(args) if args.torch else run_jax(args)
    os.makedirs("baselines", exist_ok=True)
    out = f"baselines/time_to_quality_{res['side']}.json"
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
