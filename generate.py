#!/usr/bin/env python
"""Inference / generation entry point (reference ``generate.py`` CLI-compatible).

Usage::

    python generate.py --config configs/inference_config_small.yml [--n-samples 16]

Builds the model family selected by ``architecture.model_name``, restores
weights from the per-submodel ``resume_path`` config entries (reference
generate.py:80-198 — checkpoint loading there happens inside model
constructors; here the workers' ``init_state``/``load`` handle it), and calls
the worker's ``generate_images``:

- vqvae / vqgan: reconstruction grids over the val split;
- *_transformer: AR sampling (KV-cached scan) → decode grid;
- vqdiffusion: reverse-diffusion sampling (+ filmstrip when
  ``return_all_timestamps``);
- gaussiandiffusion2d/3d: pixel-space sampling grids.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native generation")
    parser.add_argument("--config", type=str,
                        default="configs/training_config_small.yml")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--n-samples", type=int, default=16)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint dir override (else architecture.<model>.resume_path)")
    parser.add_argument("--fused-sampler", type=str, default=None,
                        choices=["on", "off", "pallas", "packed"],
                        help="override trainer.<model>.fused_sampler for the "
                             "ShuffleNet diffusion samplers")
    parser.add_argument("--fused-posterior", type=str, default=None,
                        choices=["on", "off", "interpret", "prng"],
                        help="override architecture.vqdiffusion.fused_posterior "
                             "(fused per-step posterior+sample Pallas kernel "
                             "for the discrete prior)")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX backend (the axon TPU plugin ignores "
                             "JAX_PLATFORMS; set before the first device op)")
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from vq_vae_gan_diffusion_tpu.config import load_config, validate
    from vq_vae_gan_diffusion_tpu.data import load_dataloader
    from vq_vae_gan_diffusion_tpu.parallel import create_mesh
    from vq_vae_gan_diffusion_tpu.train import build_worker
    from vq_vae_gan_diffusion_tpu.utils import create_run_dir, setup_logging
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    config = load_config(args.config)
    validate(config)
    model_name = config.architecture.model_name
    dataset_name = config.dataset.dataset_name

    if args.fused_sampler is not None:  # mirrors train.py's override
        val = {"on": True, "off": False}.get(args.fused_sampler,
                                             args.fused_sampler)
        for fam in ("gaussiandiffusion3d", "vqdiffusion"):
            if fam in config.trainer:
                config = config.replace_path(
                    f"trainer.{fam}.fused_sampler", val)
        if "vqdiffusion" in config.architecture:
            config = config.replace_path(
                "architecture.vqdiffusion.fused_sampler", val)

    if args.fused_posterior is not None:
        val = {"on": True, "off": False}.get(args.fused_posterior,
                                             args.fused_posterior)
        if "vqdiffusion" in config.architecture:
            config = config.replace_path(
                "architecture.vqdiffusion.fused_posterior", val)

    run_dir = create_run_dir(str(config.trainer.log_dir), dataset_name,
                             f"{model_name}_generate", args.config)
    logger = setup_logging(run_dir)
    mesh = create_mesh()

    worker_cls = build_worker(model_name)
    worker = worker_cls(config=config, run_dir=run_dir, logger=logger, mesh=mesh,
                        seed=args.seed)
    worker.state = worker.init_state()

    ckpt = args.ckpt
    if ckpt is None:
        mkey = model_name if model_name in config.architecture else "vqvae"
        ckpt = config.architecture[mkey].get("resume_path")
    if ckpt:
        import os
        if os.path.exists(str(ckpt)):
            worker.load(str(ckpt))
        else:
            logger.warning("checkpoint %s not found; using fresh init", ckpt)

    val_loader = None
    try:
        val_loader, _ = load_dataloader(dataset_name, "val", logger, config,
                                        seed=args.seed)
    except Exception as e:
        logger.warning("no val data: %s", e)

    worker.generate_images(val_loader, n_samples=args.n_samples, epoch=0)
    logger.info("artifacts written to %s", run_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
