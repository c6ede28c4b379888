#!/usr/bin/env python
"""Standalone pixel-space Gaussian diffusion trainer
(reference ``train_diffusion.py`` workload).

Reference behavior (train_diffusion.py:192-318): hardcoded hparams — batch 500,
T=1000, DDIM 500 steps, Adam lr 2e-4, shadow-EMA 0.999, lucidrains U-Net
(dim 64, mults (1,2,4,8), dropout 0.1), pred_noise objective, checkpoint each
epoch, 64-sample DDIM grid every 5 epochs. Here the same defaults are exposed
as flags (the reference edits source to change them), and the training step +
full DDIM chain are single jitted programs.

The reference calls ``load_dataloader`` with kwargs the dispatcher doesn't
accept (SURVEY §7 hard-part 7, train_diffusion.py:275-284) — this entry point
uses the framework's coherent data API instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="cifar10",
                        choices=["mnist", "cifar10", "Oxford102Flower", "synthetic"])
    parser.add_argument("--data-root", default="data")
    parser.add_argument("--batch-size", type=int, default=500)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--timesteps", type=int, default=1000)
    parser.add_argument("--sampling-timesteps", type=int, default=500)
    parser.add_argument("--eta", type=float, default=0.0)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--ema-decay", type=float, default=0.999)
    parser.add_argument("--objective", default="pred_noise",
                        choices=["pred_noise", "pred_x0", "pred_v"])
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--img-size", type=int, default=None)
    parser.add_argument("--log-dir", default="zlog")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX backend (the axon TPU plugin ignores "
                             "JAX_PLATFORMS; set before the first device op)")
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vq_vae_gan_diffusion_tpu.data.datasets import (CIFAR10Dataset,
                                                        MNISTDataset,
                                                        OxfordFlowersDataset,
                                                        SyntheticDataset)
    from vq_vae_gan_diffusion_tpu.data.pipeline import DataLoader
    from vq_vae_gan_diffusion_tpu.data.transforms import Preprocessor
    from vq_vae_gan_diffusion_tpu.diffusion.gaussian import (ddim_sample,
                                                             diffusion_loss,
                                                             make_schedule)
    from vq_vae_gan_diffusion_tpu.models.unet2d import Unet2DPixel
    from vq_vae_gan_diffusion_tpu.utils import (MetricWriter, ema_update,
                                                make_grid, save_image,
                                                setup_logging)

    if args.debug:
        args.batch_size = 2
        args.sampling_timesteps = 8

    channels = 1 if args.dataset == "mnist" else 3
    img_size = args.img_size or (32 if args.dataset in ("mnist", "cifar10")
                                 else 256)
    ts = time.strftime("%Y%m%d-%H%M%S")
    save_dir = os.path.join(args.log_dir, args.dataset, f"{ts}_diffusion")
    os.makedirs(save_dir, exist_ok=True)
    logger = setup_logging(save_dir)
    metrics = MetricWriter(save_dir)

    # data
    mean, std = ([0.5] * channels, [0.5] * channels)
    try:
        if args.dataset == "mnist":
            dataset = MNISTDataset(args.data_root, train=True)
        elif args.dataset == "cifar10":
            dataset = CIFAR10Dataset(args.data_root, train=True)
        elif args.dataset == "Oxford102Flower":
            dataset = OxfordFlowersDataset(args.data_root, "train")
        else:
            raise FileNotFoundError
    except FileNotFoundError:
        logger.warning("dataset %s unavailable; synthetic fallback", args.dataset)
        dataset = SyntheticDataset(max(args.batch_size * 4, 64), img_size, channels)
    prep = Preprocessor(img_size, mean, std, grayscale=channels == 1)
    loader = DataLoader(dataset, args.batch_size, prep, shuffle=True,
                        drop_last=True, seed=args.seed)
    logger.info("train samples: %d (%d batches)", loader.n, len(loader))

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    unet = Unet2DPixel(dim=args.dim, dim_mults=(1, 2, 4, 8), channels=channels,
                       dropout=0.1, dtype=dtype)
    sched = make_schedule(args.timesteps, "linear")
    opt = optax.adam(args.lr)

    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, img_size, img_size, channels), jnp.float32)
    params = unet.init(rng, dummy, None, jnp.zeros((1,), jnp.int32))["params"]
    n_par = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    logger.info("U-Net params: %.1fM", n_par / 1e6)
    opt_state = opt.init(params)
    ema_params = params

    objective, ema_decay = args.objective, args.ema_decay

    @jax.jit
    def train_step(params, opt_state, ema_params, imgs, rng):
        rng_t, rng_n, rng_d = jax.random.split(rng, 3)
        b = imgs.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, args.timesteps)
        noise = jax.random.normal(rng_n, imgs.shape)

        def loss_fn(p):
            def model_fn(x, c, tt):
                return unet.apply({"params": p}, x, c, tt, deterministic=False,
                                  rngs={"dropout": rng_d})
            loss, _ = diffusion_loss(sched, model_fn, imgs, None, t, noise,
                                     objective)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, ema_decay)
        return params, opt_state, ema_params, loss

    @jax.jit
    def sample_fn(ema_params, rng):
        def model_fn(x, c, tt):
            return unet.apply({"params": ema_params}, x, c, tt)
        n = 4 if args.debug else 64
        x_t = jax.random.normal(rng, (n, img_size, img_size, channels))
        return ddim_sample(sched, model_fn, rng, x_t, eta=args.eta,
                           sampling_timesteps=args.sampling_timesteps,
                           objective=objective)

    step = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        total, count = 0.0, 0
        for i, batch in enumerate(loader):
            rng, sub = jax.random.split(rng)
            params, opt_state, ema_params, loss = train_step(
                params, opt_state, ema_params, jnp.asarray(batch), sub)
            total += float(loss)
            count += 1
            step += 1
            if args.debug and i >= 10:
                break
        dt = time.time() - t0
        logger.info("epoch %d: avg loss %.6f (%.1fs, %.1f img/s)", epoch,
                    total / max(count, 1), dt, count * args.batch_size / dt)
        metrics.write(step, {"loss": total / max(count, 1), "epoch_time_s": dt})

        from vq_vae_gan_diffusion_tpu.utils import save_checkpoint
        save_checkpoint(os.path.join(save_dir, "ckpt"), step,
                        {"params": params, "opt_state": opt_state,
                         "ema": ema_params, "epoch": epoch})

        if epoch % 5 == 0 or args.debug:
            rng, sub = jax.random.split(rng)
            samples = np.asarray(sample_fn(ema_params, sub))
            logger.info("sample stats: mean %.3f std %.3f", samples.mean(),
                        samples.std())
            grid = ((np.clip(samples, -1, 1) + 1) / 2 * 255).astype(np.uint8)
            save_image(make_grid(grid, nrow=8),
                       os.path.join(save_dir, f"samples_epoch_{epoch}.png"))
        if args.debug:
            break
    logger.info("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
