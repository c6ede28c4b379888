#!/usr/bin/env python
"""Export a checkpoint trained here to the reference's torch .pth flavors.

The inverse of tools/import_torch_checkpoint.py: reads an Orbax checkpoint
(as written by the training workers) and emits a ``state_dict`` the reference
repo's modules load — so TPU-trained models can be evaluated with the
reference's torch tooling (its LPIPS/FID stack, its samplers) or finetuned
there:

    python tools/export_torch_checkpoint.py \
        --config configs/training_config_mnist.yml \
        --ckpt zlog/mnist/vqgan/run_*/ckpt --out vqvae_mnist.pth \
        --disc-out disc_mnist.pth

Save flavors match the reference worker that would have written them
(vqganVqvaeWorker.py:471-477 raw vqvae + separate discriminator file,
vaeWorker.py:246-249 ``{'vae_state_dict': ...}``, vqTransformerWorker.py:231
bare minGPT). For the diffusion families the exported dict is the *denoiser*
state_dict: the reference wrappers' schedule buffers are derived from
hyperparameters, not trained state — load with
``diffusion.model.load_state_dict(sd)`` (or ``strict=False`` on the wrapper).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tensorize(sd):
    import torch
    return {k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True, help="Orbax checkpoint dir")
    ap.add_argument("--family", default=None,
                    help="override architecture.model_name")
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--disc-out", default=None,
                    help="also export the discriminator here (vqgan family)")
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA weights instead of the online ones "
                    "(diffusion families)")
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")  # host-side job
    except Exception:
        pass

    import torch

    from tools.import_torch_checkpoint import _vq_geometry
    from vq_vae_gan_diffusion_tpu.config import load_config, validate
    from vq_vae_gan_diffusion_tpu.utils import restore_checkpoint
    from vq_vae_gan_diffusion_tpu.utils import torch_export as te

    config = load_config(args.config)
    validate(config)
    family = args.family or str(config.architecture.model_name)

    state = restore_checkpoint(args.ckpt)["state"]

    if family in ("vqvae", "vqgan"):
        sd = te.export_vqvae(state["vqvae_params"], **_vq_geometry(config))
        payload = _tensorize(sd)
        if args.disc_out and state.get("disc_params"):
            dsd = te.export_discriminator(state["disc_params"],
                                          state["disc_batch_stats"])
            torch.save(_tensorize(dsd), args.disc_out)
            print(f"exported discriminator → {args.disc_out}")
    elif family == "vae":
        sd = te.export_vae(state["params"], **_vq_geometry(config, key="vae"))
        payload = {"vae_state_dict": _tensorize(sd)}  # vaeWorker.py:247 flavor
    elif family in ("vqvae_transformer", "vqgan_transformer"):
        payload = _tensorize(te.export_gpt(state["gpt_params"]))
    elif family == "vqdiffusion":
        p = state["ema_params"] if args.ema else state["unet_params"]
        s = state["ema_batch_stats"] if args.ema else state["unet_batch_stats"]
        sd = (te.export_shuffle_unet(p, s) if "enc0" in p
              else te.export_unet1d(p))
        payload = _tensorize(sd)
    elif family in ("gaussiandiffusion2d", "gaussiandiffusion3d"):
        p = state["ema_params"] if args.ema else state["params"]
        s = state["ema_batch_stats"] if args.ema else state["batch_stats"]
        sd = (te.export_shuffle_unet(p, s) if "enc0" in p
              else te.export_unet1d(p))
        payload = _tensorize(sd)
    else:
        raise SystemExit(f"unsupported family {family!r}")

    torch.save(payload, args.out)
    print(f"exported {family} checkpoint → {os.path.abspath(args.out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
