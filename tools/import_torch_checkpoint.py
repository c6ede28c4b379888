#!/usr/bin/env python
"""Import a reference (torch) checkpoint into this framework.

Converts the reference's per-worker ``torch.save`` flavors (SURVEY §5;
vqganVqvaeWorker.py:471-477, vaeWorker.py:246-249, vqTransformerWorker.py:231,
vqdiffusionWorker.py:243-248, gaussianDiffusion2DWorker.py:164-172,
gaussianDiffusion3DWorker.py:136-137) into a resume-able Orbax checkpoint in
this framework's one-format-for-all layout ``{state, step}``, so a user
migrating from the reference can keep their trained weights:

    python tools/import_torch_checkpoint.py \
        --config configs/training_config_mnist.yml \
        --pth /path/to/vqvae_mnist.pth --disc-pth /path/to/disc.pth \
        --out runs/imported_vqgan

    # then: set architecture.<model>.resume_path: runs/imported_vqgan
    # (or generate.py --ckpt runs/imported_vqgan)

The model family defaults to the config's ``architecture.model_name``.
Optimizer state is freshly initialized (the reference's torch optimizer
moments are not portable to optax); ``--step`` seeds the step counter for
schedules that depend on it.

For composite families (transformer prior, vq-diffusion) only the prior is
imported — import the frozen VQVAE separately with a vqvae-family config and
point ``architecture.vqvae.resume_path`` at it, mirroring the reference's
own two-checkpoint flow (vqTransformerWorker.py:60-75).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_numpy(obj):
    """Recursively convert torch tensors in a (possibly nested) dict."""
    if hasattr(obj, "detach"):
        return np.asarray(obj.detach().cpu().numpy())
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    return obj


def _strip(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _unwrap_ema(sd: dict) -> dict:
    """EMA state_dict → the wrapped diffusion module's state_dict.

    Handles both flavors the reference uses: torch swa AveragedModel
    (utils/utils.py:135 — keys ``n_averaged`` + ``module.*``) and ema_pytorch
    (gaussianDiffusion2DWorker.py:18 — keys ``ema_model.*``/``online_model.*``).
    """
    if any(k.startswith("ema_model.") for k in sd):
        return _strip(sd, "ema_model.")
    if any(k.startswith("module.") for k in sd):
        return _strip(sd, "module.")
    return sd


def _unet_from_diffusion(sd: dict):
    """Diffusion-wrapper state_dict → (params, batch_stats or {}) for the
    denoiser under its ``model.`` attribute; schedule buffers are dropped
    (we recompute them from the config, parity-tested)."""
    from vq_vae_gan_diffusion_tpu.utils.torch_import import (
        convert_shuffle_unet, convert_unet1d)
    denoiser = _strip(sd, "model.")
    if any(k.startswith("encoder_blocks.") for k in denoiser):
        return convert_shuffle_unet(denoiser)
    return convert_unet1d(denoiser), {}


def _vq_geometry(config, key: str = "vqvae"):
    # same fallback as models/vae.py::from_config — a vae section may omit
    # geometry and inherit the vqvae one
    a = config.architecture.get(key, config.architecture.get("vqvae"))
    ds = config.dataset
    name = ds.dataset_name
    return dict(
        img_size=int(ds.img_size[name]),
        latent_size=int(a.latent_size),
        intermediate_channels=[int(c) for c in a.intermediate_channels],
        n_res_encoder=int(a.num_residual_blocks_encoder),
        n_res_decoder=int(a.num_residual_blocks_decoder),
        attn_res=[int(r) for r in a.attention_resolution],
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True, help="this framework's YAML config")
    ap.add_argument("--pth", required=True, help="reference torch checkpoint")
    ap.add_argument("--disc-pth", default=None,
                    help="separate discriminator checkpoint (vqgan family; "
                    "vqganVqvaeWorker.py:477 saves it standalone)")
    ap.add_argument("--family", default=None,
                    help="override architecture.model_name")
    ap.add_argument("--out", required=True, help="output Orbax checkpoint dir")
    ap.add_argument("--step", type=int, default=0,
                    help="step counter to seed the imported state with")
    args = ap.parse_args(argv)

    import jax

    # conversion is a host-side job; never touch (or wait on) the TPU tunnel
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. under pytest) — already CPU

    import torch

    from vq_vae_gan_diffusion_tpu.config import load_config, validate
    from vq_vae_gan_diffusion_tpu.train import build_worker
    from vq_vae_gan_diffusion_tpu.utils import torch_import as ti

    config = load_config(args.config)
    validate(config)
    family = args.family or str(config.architecture.model_name)

    try:
        raw = torch.load(args.pth, map_location="cpu", weights_only=True)
    except Exception:
        raw = torch.load(args.pth, map_location="cpu", weights_only=False)
    raw = _to_numpy(raw)

    worker_cls = build_worker(family)
    kwargs = dict(config=config, run_dir=args.out, save_ckpt_dir=args.out)
    if family in ("vqdiffusion", "gaussiandiffusion3d"):
        kwargs["num_iters_per_epoch"] = 100
    worker = worker_cls(**kwargs)
    state = worker.init_state()

    if family in ("vqvae", "vqgan"):
        params = ti.convert_vqvae(raw, **_vq_geometry(config))
        state = state.replace(vqvae_params=params)
        if args.disc_pth:
            try:
                dsd = torch.load(args.disc_pth, map_location="cpu",
                                 weights_only=True)
            except Exception:
                dsd = torch.load(args.disc_pth, map_location="cpu",
                                 weights_only=False)
            dp, dstats = ti.convert_discriminator(_to_numpy(dsd))
            state = state.replace(disc_params=dp, disc_batch_stats=dstats)
    elif family == "vae":
        sd = raw.get("vae_state_dict", raw)  # vaeWorker.py:247
        params = ti.convert_vae(sd, **_vq_geometry(config, key="vae"))
        state = state.replace(params=params)
    elif family in ("vqvae_transformer", "vqgan_transformer"):
        state = state.replace(gpt_params=ti.convert_gpt(raw))
    elif family == "vqdiffusion":
        sd = raw.get("diffusion", raw)  # vqdiffusionWorker.py:243
        up, ustats, lt_hist, lt_count = ti.convert_discrete_diffusion(sd)
        lt = state.lt_state
        if lt != ():
            lt = lt._replace(Lt_history=np.asarray(lt_hist, np.float32),
                             Lt_count=np.asarray(lt_count, np.float32))
        ema_p, ema_s = up, ustats
        if "model_ema" in raw:
            ema_p, ema_s, _, _ = ti.convert_discrete_diffusion(
                _unwrap_ema(raw["model_ema"]))
        state = state.replace(unet_params=up, unet_batch_stats=ustats,
                              ema_params=ema_p, ema_batch_stats=ema_s,
                              lt_state=lt)
    elif family in ("gaussiandiffusion2d", "gaussiandiffusion3d"):
        model_sd = raw.get("model", raw)
        params, stats = _unet_from_diffusion(model_sd)
        ema_p, ema_s = params, stats
        ema_sd = raw.get("ema") or raw.get("model_ema")
        if ema_sd is not None:
            ema_p, ema_s = _unet_from_diffusion(_unwrap_ema(ema_sd))
        state = state.replace(params=params, batch_stats=stats,
                              ema_params=ema_p, ema_batch_stats=ema_s)
    else:
        raise SystemExit(f"unsupported family {family!r} — the reference has "
                         "no checkpoint format for it")

    worker.state = state
    worker.global_step = args.step
    # go through the worker's own save() so the tree layout (incl. the epoch
    # counter train/base.py:264-267 restores) always matches what load() expects
    worker.save(epoch=0)
    print(f"imported {family} checkpoint → {os.path.abspath(args.out)} "
          f"(step {args.step})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
