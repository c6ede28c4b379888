#!/usr/bin/env python
"""Stage-2 sample-fidelity parity: feature-FID of generated samples, both sides.

The reference's actual product is *samples* from trained stage-2 priors
(worker/vqTransformerWorker.py:198-217 — GPT prior, temperature 1.0 /
top_k 100 / 256 steps; worker/vqdiffusionWorker.py:192-228 — diffusion
prior). Round 4 proved training-loss time-to-quality; this harness closes
the loop on the generated images themselves (VERDICT r4 missing-1):

  1. train both sides to the SAME quality bar with the time_to_quality
     protocol (identical data/geometry/optimizer);
  2. sample N sequences/images from each trained model with the reference's
     sampling protocol;
  3. embed real + generated sets with ONE shared feature net — the
     deterministic random-VGG from models/lpips.py (zero-egress stand-in for
     pretrained VGG; identical weights for every set, so FIDs are
     comparable) — per-stage spatially-averaged taps, concatenated;
  4. report Fréchet distance (generated vs real) per side, plus the
     cross-side FID between the two generated sets.

Families:
  gpt         minGPT prior on 16×16 pixel-bin token grids; a token sequence
              IS a 16² image (levels/255), so decoding is exact.
  gaussian3d  ShuffleNet U-Net DDPM on MNIST-class images; samples are full
              reverse chains (reference worker's n_samples path).

Usage:
  python tools/sample_fidelity.py --family gpt [--torch-too] [--n 512]
Writes baselines/sample_fidelity_<family>.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VQGD_NO_TB", "1")

import numpy as np


# ---------------------------------------------------------------------------
# Shared feature embedding + FID
# ---------------------------------------------------------------------------

def embed_images(imgs: np.ndarray, batch: int = 64) -> np.ndarray:
    """[N, H, W, C] images in [0, 1] → [N, D] features via the shared
    deterministic random-VGG (models/lpips.py), per-stage spatial means."""
    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.models.lpips import (VGG16Features,
                                                       load_lpips_params)

    params = load_lpips_params(None, img_channels=3)["vgg"]
    vgg = VGG16Features()

    @jax.jit
    def feats(x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x * 2.0 - 1.0  # [-1, 1], the lpips input convention
        taps = vgg.apply({"params": params}, x)
        return jnp.concatenate(
            [jnp.mean(t.astype(jnp.float32), axis=(1, 2)) for t in taps], -1)

    out = []
    for i in range(0, len(imgs), batch):
        out.append(np.asarray(feats(jnp.asarray(imgs[i:i + batch],
                                                jnp.float32))))
    return np.concatenate(out, 0)


def frechet_distance(a: np.ndarray, b: np.ndarray) -> float:
    """FID between two feature sets [N, D]: |μa-μb|² + tr(Ca+Cb-2√(CaCb))."""
    mu_a, mu_b = a.mean(0), b.mean(0)
    ca = np.cov(a, rowvar=False)
    cb = np.cov(b, rowvar=False)
    diff = float(np.sum((mu_a - mu_b) ** 2))
    # sqrtm(Ca·Cb) via eigendecomposition of the symmetrized product:
    # √(Ca Cb) has the same trace as √(√Ca · Cb · √Ca), which is PSD.
    va, wa = np.linalg.eigh(ca)
    va = np.clip(va, 0, None)
    sqrt_ca = (wa * np.sqrt(va)) @ wa.T
    m = sqrt_ca @ cb @ sqrt_ca
    ev = np.clip(np.linalg.eigvalsh((m + m.T) / 2), 0, None)
    covmean_tr = float(np.sum(np.sqrt(ev)))
    return diff + float(np.trace(ca) + np.trace(cb)) - 2.0 * covmean_tr


def tokens_to_images(tok: np.ndarray, grid: int, vocab: int) -> np.ndarray:
    """[N, grid²] int tokens → [N, grid, grid, 1] float images in [0, 1]."""
    return (tok.reshape(-1, grid, grid, 1).astype(np.float32)
            / float(vocab - 1))


# ---------------------------------------------------------------------------
# GPT family
# ---------------------------------------------------------------------------

def sample_gpt_jax(cap: dict, n: int, seed: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.models.mingpt import sample_tokens

    gpt, params = cap["gpt"], cap["params"]
    L = cap["seq_len"]
    outs, bs = [], 128
    fn = jax.jit(lambda p, rng, sos: sample_tokens(
        gpt, p, rng, sos, 1, L, temperature=1.0, top_k=100))
    for i in range(0, n, bs):
        b = min(bs, n - i)
        sos = jnp.zeros((b, 1), jnp.int32)
        toks = fn(params, jax.random.PRNGKey(seed + i), sos)
        outs.append(np.asarray(toks))
    return np.concatenate(outs, 0)


def sample_gpt_torch(cap: dict, n: int, seed: int) -> np.ndarray:
    """Reference sampling protocol (vqTransformer.py:174-216): crop to
    block_size, last-logit / temperature, top-k 100, multinomial."""
    import torch
    import torch.nn.functional as F

    gpt = cap["gpt"]
    L = cap["seq_len"]
    gpt.eval()
    torch.manual_seed(seed)
    outs, bs = [], 128
    with torch.no_grad():
        for i in range(0, n, bs):
            b = min(bs, n - i)
            x = torch.zeros((b, 1), dtype=torch.long)
            for _ in range(L):
                logits, _ = gpt(x[:, -gpt.block_size:])
                logits = logits[:, -1, :] / 1.0
                v, _ = torch.topk(logits, 100)
                logits[logits < v[:, [-1]]] = -float("inf")
                probs = F.softmax(logits, dim=-1)
                ix = torch.multinomial(probs, num_samples=1)
                x = torch.cat((x, ix), dim=1)
            outs.append(x[:, 1:].numpy())
    return np.concatenate(outs, 0)


def run_gpt(args) -> dict:
    from tools.time_to_quality import (GRID, VOCAB, run_jax_gpt,
                                       run_torch_gpt)

    res: dict = {"family": "gpt", "n_samples": args.n,
                 "protocol": "temperature 1.0, top_k 100, SOS-start, "
                             "ref vqTransformer.py:174-216"}
    cap_j: dict = {}
    t0 = time.time()
    ttq_j = run_jax_gpt(args, capture=cap_j)
    res["jax_train"] = {k: ttq_j[k] for k in
                        ("seconds_to_target", "steps", "backend")
                        if k in ttq_j}
    real = tokens_to_images(
        cap_j["train_tok"].reshape(-1, GRID * GRID)[:args.n * 2], GRID, VOCAB)
    feats_real = embed_images(real)

    toks_j = sample_gpt_jax(cap_j, args.n, args.seed + 77)
    imgs_j = tokens_to_images(toks_j, GRID, VOCAB)
    feats_j = embed_images(imgs_j)
    res["fid_jax_vs_real"] = round(frechet_distance(feats_j, feats_real), 3)
    print(f"[fidelity] jax FID vs real: {res['fid_jax_vs_real']} "
          f"({time.time() - t0:.0f}s)", flush=True)

    if args.torch_too:
        cap_t: dict = {}
        ttq_t = run_torch_gpt(args, capture=cap_t)
        res["torch_train"] = {k: ttq_t[k] for k in
                              ("seconds_to_target", "steps") if k in ttq_t}
        toks_t = sample_gpt_torch(cap_t, args.n, args.seed + 77)
        imgs_t = tokens_to_images(toks_t, GRID, VOCAB)
        feats_t = embed_images(imgs_t)
        res["fid_torch_vs_real"] = round(
            frechet_distance(feats_t, feats_real), 3)
        res["fid_jax_vs_torch"] = round(frechet_distance(feats_j, feats_t), 3)
    # yardstick: FID of one real half vs the other (sampling-noise floor)
    half = len(feats_real) // 2
    res["fid_real_vs_real_floor"] = round(
        frechet_distance(feats_real[:half], feats_real[half:]), 3)
    return res


# ---------------------------------------------------------------------------
# gaussian3d family
# ---------------------------------------------------------------------------

def sample_g3d_jax(cap: dict, n: int, seed: int) -> np.ndarray:
    import jax

    w, state = cap["worker"], cap["state"]
    proc, unet = cap["worker"].process, cap["worker"].unet

    def model_fn(x, c, t):
        return unet.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          x, None, t, train=False)
    proc.model_fn = model_fn
    fn = jax.jit(lambda rng: proc.ddpm_sample(rng, n, False, True))
    out = np.asarray(fn(jax.random.PRNGKey(seed)))
    return np.clip(out, 0, 1)  # ddpm_sample already maps [-1,1] → [0,1]


def sample_g3d_torch(cap: dict, n: int, seed: int) -> np.ndarray:
    import torch

    model = cap["model"]
    model.eval()
    torch.manual_seed(seed)
    with torch.no_grad():
        out = model.sampling(n, clipped_reverse_diffusion=True)
    arr = out.numpy() if hasattr(out, "numpy") else np.asarray(out)
    arr = np.transpose(arr, (0, 2, 3, 1))  # NCHW → NHWC
    return np.clip(arr, 0, 1)  # sampling() already maps [-1,1] → [0,1]


def run_g3d(args) -> dict:
    from tools.time_to_quality import run_jax_g3d, run_torch_g3d

    res: dict = {"family": "gaussian3d", "n_samples": args.n,
                 "protocol": "full DDPM reverse chain, clipped "
                             "(ref diffusion_gaussian3d.py:446)"}
    cap_j: dict = {}
    ttq_j = run_jax_g3d(args, capture=cap_j)
    res["jax_train"] = {k: ttq_j[k] for k in
                        ("seconds_to_target", "steps", "backend")
                        if k in ttq_j}
    real = np.clip(cap_j["train_np"].reshape(
        -1, *cap_j["train_np"].shape[2:])[:args.n * 2] * 0.5 + 0.5, 0, 1)
    feats_real = embed_images(real)
    imgs_j = sample_g3d_jax(cap_j, args.n, args.seed + 99)
    feats_j = embed_images(imgs_j)
    res["fid_jax_vs_real"] = round(frechet_distance(feats_j, feats_real), 3)
    print(f"[fidelity] jax FID vs real: {res['fid_jax_vs_real']}", flush=True)

    if args.torch_too:
        cap_t: dict = {}
        ttq_t = run_torch_g3d(args, capture=cap_t)
        res["torch_train"] = {k: ttq_t[k] for k in
                              ("seconds_to_target", "steps") if k in ttq_t}
        imgs_t = sample_g3d_torch(cap_t, args.n, args.seed + 99)
        feats_t = embed_images(imgs_t)
        res["fid_torch_vs_real"] = round(
            frechet_distance(feats_t, feats_real), 3)
        res["fid_jax_vs_torch"] = round(frechet_distance(feats_j, feats_t), 3)
    half = len(feats_real) // 2
    res["fid_real_vs_real_floor"] = round(
        frechet_distance(feats_real[:half], feats_real[half:]), 3)
    return res


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--family", choices=["gpt", "gaussian3d"], default="gpt")
    ap.add_argument("--n", type=int, default=512, help="samples per set")
    ap.add_argument("--torch-too", action="store_true",
                    help="also train+sample the torch reference side (slow)")
    # time_to_quality runner knobs (shared protocol)
    ap.add_argument("--config", default="configs/training_config_mnist.yml")
    ap.add_argument("--max-seconds", type=float, default=900.0)
    ap.add_argument("--max-steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--nll-target", type=float, default=3.0)
    ap.add_argument("--mse-target", type=float, default=0.35)
    ap.add_argument("--dispatch", type=int, default=8)
    args = ap.parse_args()

    res = (run_gpt if args.family == "gpt" else run_g3d)(args)
    os.makedirs("baselines", exist_ok=True)
    out = f"baselines/sample_fidelity_{args.family}.json"
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
