#!/usr/bin/env python
"""Export lpips-0.1.4 VGG weights to the .npz format our JAX LPIPS loads.

Run this ANYWHERE torchvision + lpips are installed (they are not in the
zero-egress TPU image):

    python tools/export_lpips_weights.py --out weights/lpips_vgg.npz

then ship the .npz next to the repo (or set $LPIPS_WEIGHTS). Keys follow
``vq_vae_gan_diffusion_tpu.models.lpips._params_from_npz``:
``vgg/conv{stage}_{i}/kernel`` (HWIO), ``vgg/conv{stage}_{i}/bias``,
``lin{0..4}`` (the lpips linear head weights, flattened).
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights/lpips_vgg.npz")
    args = parser.parse_args()

    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="vgg")
    vgg = net.net  # lpips.pretrained_networks.vgg16 wrapper
    convs = [m for m in vgg.modules() if isinstance(m, torch.nn.Conv2d)]
    stages = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    names = [f"conv{s}_{i}" for s, (_, n) in enumerate(stages) for i in range(n)]
    assert len(convs) == len(names), (len(convs), len(names))

    out = {}
    for name, conv in zip(names, convs):
        out[f"vgg/{name}/kernel"] = np.transpose(
            conv.weight.detach().numpy(), (2, 3, 1, 0))
        out[f"vgg/{name}/bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        out[f"lin{i}"] = lin.model[-1].weight.detach().numpy().reshape(-1)

    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
