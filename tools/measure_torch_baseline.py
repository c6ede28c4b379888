#!/usr/bin/env python
"""Measure the reference PyTorch stack's train-step throughput on this host.

BASELINE.md's parity protocol: run the reference and this framework on
identical configs and record both sides. The reference publishes no numbers
and this image has no GPU, so the comparable measurement is the reference's
VQGAN MNIST-class step (same shapes as bench.py: batch 200 @ 28×28×1,
ene/dec + codebook + discriminator + backward + 2×Adam) on torch-CPU. LPIPS is
replaced by an L1 map (no torchvision/lpips in the image) on BOTH sides? No —
bench.py keeps our full LPIPS; this therefore *under*-reports our relative
speedup. The result lands in ``baselines/torch_cpu_reference.json`` which
bench.py uses for ``vs_baseline``.

Requires /root/reference mounted (read-only import, no code copied).
"""

from __future__ import annotations

import json
import os
import sys
import time

REF = "/root/reference"
BATCH, IMG = 200, 28
WARMUP, ITERS = 1, 5


def main() -> int:
    if not os.path.isdir(REF):
        print("reference not mounted; nothing to measure", file=sys.stderr)
        return 1
    sys.path.insert(0, REF)
    import torch
    import torch.nn.functional as F

    from network.common.decoder import Decoder
    from network.common.encoder import Encoder
    from network.vqgan.discriminator import Discriminator
    from network.vqvae.submodule.codebook import CodeBook

    torch.manual_seed(0)
    enc = Encoder(img_channels=1, image_size=IMG, latent_channels=64,
                  intermediate_channels=[64, 128, 128], num_residual_blocks=2,
                  attention_resolution=[7])
    dec = Decoder(img_channels=1, latent_channels=64, latent_size=7,
                  intermediate_channels=[64, 128, 128], num_residual_blocks=3,
                  attention_resolution=[7])
    cb = CodeBook(num_codebook_vectors=1024, latent_dim=64)
    quant = torch.nn.Conv2d(64, 64, 1)
    post = torch.nn.Conv2d(64, 64, 1)
    disc = Discriminator(image_channels=1)
    gen_params = (list(enc.parameters()) + list(dec.parameters()) +
                  list(cb.parameters()) + list(quant.parameters()) +
                  list(post.parameters()))
    opt_g = torch.optim.Adam(gen_params, lr=2.25e-4, betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(disc.parameters(), lr=2.25e-4, betas=(0.5, 0.9))
    imgs = torch.randn(BATCH, 1, IMG, IMG)

    def step():
        z, idx, q_loss = cb(quant(enc(imgs)))
        decoded = dec(post(z))
        rec = torch.abs(imgs - decoded).mean()
        disc_real = disc(imgs)
        disc_fake = disc(decoded)
        g_loss = -disc_fake.mean()
        last_w = dec.model[-1].weight
        g1 = torch.autograd.grad(rec, last_w, retain_graph=True)[0]
        g2 = torch.autograd.grad(g_loss, last_w, retain_graph=True)[0]
        lam = 0.8 * torch.clamp(g1.norm() / (g2.norm() + 1e-4), 0, 1e4).detach()
        vq_loss = rec + q_loss + lam * g_loss
        gan_loss = 0.5 * (F.relu(1 - disc_real).mean() + F.relu(1 + disc_fake).mean())
        opt_g.zero_grad(); vq_loss.backward(retain_graph=True)
        opt_d.zero_grad(); gan_loss.backward()
        opt_d.step(); opt_g.step()

    for _ in range(WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step()
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt
    os.makedirs("baselines", exist_ok=True)
    with open("baselines/torch_cpu_reference.json", "w") as f:
        json.dump({"images_per_sec": ips, "batch": BATCH, "device": "cpu",
                   "note": "reference VQGAN step (L1 recon, no LPIPS) on torch-CPU"},
                  f, indent=2)
    print(json.dumps({"torch_cpu_images_per_sec": round(ips, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
