"""Pixel-space Gaussian diffusion workers.

``GaussianDiffusion2DWorker`` (reference worker/gaussianDiffusion2DWorker.py):
rows-as-channels Conv1d U-Net over grayscale images ([B, H, W], H as channels
— train.py:197-214). Adam with the config's adam_betas tuple, gradient
accumulation + clip 1.0 (:202-206), EMA(β=0.9999, every 10) (:150-154).
The reference constructs an HF ``Accelerator`` but never calls ``prepare()``
(SURVEY §2.7) — it was de-facto single-process AMP sugar; here mixed precision
is the model dtype and data parallelism is the mesh.
Generation starts from uniform ``torch.rand`` noise (:240 — reproduced) and
min-max normalizes the samples for saving (:243).

``GaussianDiffusion3DWorker`` (reference worker/gaussianDiffusion3DWorker.py):
Conv2d ShuffleNet DDPM on images, AdamW + OneCycleLR (:96-98), batch-adjusted
EMA (:63-66), sampling via the EMA weights (:156-158).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config, resolve_batch_size, resolve_img_channels, resolve_img_size
from ..utils.schedules import torch_onecycle_schedules
from ..diffusion.gaussian2d import GaussianDiffusion2D, GaussianDiffusion2DConfig
from ..diffusion.gaussian3d import GaussianDiffusion3D
from ..models.unet1d import Unet1D
from ..models.unet_shuffle import ShuffleUNet
from ..utils import ema_update, make_grid, save_image
from .base import BaseWorker, maybe_accumulate


class DiffusionState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any
    step: jax.Array


class GaussianDiffusion2DWorker(BaseWorker):
    model_name = "gaussiandiffusion2d"

    def __init__(self, config: Config, run_dir: str, logger=None, mesh=None,
                 debug: bool = False, seed: int = 0, save_ckpt_dir=None,
                 dtype=jnp.float32, gradient_accumulate_every: int = 1):
        super().__init__(config, run_dir, logger, mesh, debug, seed, save_ckpt_dir)
        img_size = resolve_img_size(config)
        dcfg = config.architecture.gaussiandiffusion2d
        tr = config.trainer.gaussiandiffusion2d
        self.img_size = img_size
        # reference hardcodes dim 64 / (1,2,4,8) (unet2d.py); knobs let tiny
        # CI/dryrun configs shrink the compile
        self.unet = Unet1D(dim=int(dcfg.get("unet_base_dim", 64)),
                           dim_mults=tuple(dcfg.get("unet_dim_mults",
                                                    (1, 2, 4, 8))),
                           channels=img_size, out_dim=img_size, dtype=dtype)
        self.process = GaussianDiffusion2D(
            GaussianDiffusion2DConfig(
                seq_length=img_size, timesteps=int(dcfg.diffusion_steps),
                sampling_timesteps=int(dcfg.sampling_steps),
                diffusion_type="gaussiandiffusion2d"),
            model_fn=None)
        lr = float(tr.learning_rate)
        betas = tr.get("adam_betas", (0.9, 0.99))
        if isinstance(betas, str):
            betas = (0.9, 0.99)
        base_opt = optax.adam(lr, b1=float(betas[0]), b2=float(betas[1]))
        opt = optax.chain(optax.clip_by_global_norm(1.0), base_opt)
        if gradient_accumulate_every > 1:  # ctor arg (reference signature)
            opt = optax.MultiSteps(opt, gradient_accumulate_every)
        else:                              # uniform trainer-config knob
            opt = maybe_accumulate(opt, tr)
        self.opt = opt

        unet, process = self.unet, self.process

        def model_fn_factory(params):
            def model_fn(x, self_cond, t):
                # torch Conv1d [B, C=H, L=W] → flax [B, W, H]
                out = unet.apply({"params": params}, jnp.swapaxes(x, 1, 2),
                                 None, t)
                return jnp.swapaxes(out, 1, 2)
            return model_fn

        self._model_fn_factory = model_fn_factory

        @jax.jit
        def train_step(state: DiffusionState, imgs: jax.Array, rng: jax.Array):
            x0 = imgs[..., 0] if imgs.ndim == 4 else imgs  # [B, H, W]

            def loss_fn(params):
                process.model_fn = model_fn_factory(params)
                return process.loss(x0, rng)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            do_ema = (state.step % 10) == 0
            decay = jnp.where(do_ema, 0.9999, 1.0)
            new_ema = ema_update(state.ema_params, new_params, decay)
            return state.replace(params=new_params, ema_params=new_ema,
                                 opt_state=new_opt, step=state.step + 1), \
                {"loss": loss}

        self._train_step = train_step

        @jax.jit
        def sample(params, rng):
            process.model_fn = model_fn_factory(params)
            rng_init, rng_loop = jax.random.split(rng)
            xt = jax.random.uniform(rng_init, (4, img_size, img_size))
            return process.sample(rng_loop, 4, xt=xt)

        self._sample = sample

    def init_state(self) -> DiffusionState:
        rng = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((1, self.img_size, self.img_size), jnp.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            params = self.unet.init(rng, dummy, None,
                                    jnp.zeros((1,), jnp.int32))["params"]
        params = jax.device_put(params, jax.devices()[0])
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
        self.logger.info("gaussiandiffusion2d U-Net params: %.1fM", n / 1e6)
        # EMA starts as a copy (donation-safe: see the 3D worker's init_state)
        return DiffusionState(params=params, batch_stats={},
                              ema_params=jax.tree_util.tree_map(jnp.array, params),
                              ema_batch_stats={}, opt_state=self.opt.init(params),
                              step=jnp.zeros((), jnp.int32))

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def generate_images(self, val_loader=None, n_samples: int = 4, epoch: int = 0):
        imgs = np.asarray(self._sample(self.state.ema_params, self.next_rng()))
        imgs = (imgs - imgs.min()) / max(imgs.max() - imgs.min(), 1e-9)
        imgs = (imgs[..., None] * 255).astype(np.uint8)
        save_image(make_grid(imgs, nrow=4),
                   os.path.join(self.run_dir, f"Generating_epoch{epoch:03d}.jpg"))


class GaussianDiffusion3DWorker(BaseWorker):
    model_name = "gaussiandiffusion3d"

    def __init__(self, config: Config, run_dir: str, logger=None, mesh=None,
                 debug: bool = False, seed: int = 0, save_ckpt_dir=None,
                 dtype=jnp.float32, num_iters_per_epoch: int = 100):
        super().__init__(config, run_dir, logger, mesh, debug, seed, save_ckpt_dir)
        img_size = resolve_img_size(config)
        channels = resolve_img_channels(config)
        dcfg = config.architecture.gaussiandiffusion3d
        tr = config.trainer.gaussiandiffusion3d
        self.img_size, self.channels = img_size, channels
        timesteps = int(dcfg.diffusion_steps)
        self.n_samples = int(dcfg.get("n_samples", 16))
        # train.py:225-236: dim_mults=[2,4] for the pixel workload
        self.unet = ShuffleUNet(timesteps, 256, channels, channels,
                                int(dcfg.model_base_dim), (2, 4), dtype=dtype)
        self.process = GaussianDiffusion3D(
            (img_size, img_size), channels, timesteps,
            int(dcfg.sampling_steps), None, "noise_mse", "ddpm")
        self.no_clip = bool(tr.get("no_clip", False))
        lr = float(tr.learning_rate)
        num_epochs = int(config.trainer.num_epochs)
        total_steps = max(num_epochs * num_iters_per_epoch, 10)
        # torch-exact OneCycleLR incl. its β₁ cycling (0.95↔0.85), which
        # torch applies by default and which overrides AdamW's own β₁
        # (reference gaussianDiffusion3DWorker.py:94-97)
        lr_fn, b1_fn = torch_onecycle_schedules(total_steps, lr)
        self.opt = maybe_accumulate(optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_fn, b1=b1_fn, weight_decay=0.01), tr)
        self.model_ema_steps = int(tr.get("model_ema_steps", 10))
        base_decay = float(tr.get("model_ema_decay", 0.995))
        batch_size = resolve_batch_size(config)
        alpha = min(1.0, (1.0 - base_decay) * batch_size * self.model_ema_steps
                    / max(num_epochs, 1))
        self.ema_decay = 1.0 - alpha

        unet, process, opt = self.unet, self.process, self.opt
        ema_steps, ema_decay = self.model_ema_steps, self.ema_decay

        def bind(params, stats, train):
            holder = {}

            def model_fn(x, self_cond, t):
                variables = {"params": params, "batch_stats": stats}
                if train:
                    out, upd = unet.apply(variables, x, None, t, train=True,
                                          mutable=["batch_stats"])
                    holder["stats"] = upd["batch_stats"]
                    return out
                return unet.apply(variables, x, None, t, train=False)
            return model_fn, holder

        @jax.jit
        def train_step(state: DiffusionState, imgs: jax.Array, rng: jax.Array):
            def loss_fn(params):
                model_fn, holder = bind(params, state.batch_stats, True)
                process.model_fn = model_fn
                loss = process.loss(imgs, rng)
                return loss, holder.get("stats", state.batch_stats)

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            new_stats = jax.lax.stop_gradient(new_stats)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            do_ema = (state.step % ema_steps) == 0
            decay = jnp.where(do_ema, ema_decay, 1.0)
            new_ema = ema_update(state.ema_params, new_params, decay)
            new_ema_stats = jax.tree_util.tree_map(
                lambda e, p: jnp.where(do_ema, p, e).astype(e.dtype),
                state.ema_batch_stats, new_stats)
            return state.replace(params=new_params, batch_stats=new_stats,
                                 ema_params=new_ema, ema_batch_stats=new_ema_stats,
                                 opt_state=new_opt, step=state.step + 1), \
                {"loss": loss}

        self._train_step = train_step
        no_clip = self.no_clip
        fused = tr.get("fused_sampler", True)

        def sample(params, stats, rng, n):
            if fused:  # BN-folded shift-add inference fwd (2.1×, shuffle_infer)
                from ..models.shuffle_infer import (apply_folded, fold_unet,
                                                    resolve_sampler_mode)
                folded = fold_unet({"params": params, "batch_stats": stats},
                                   dtype=unet.dtype)
                process.model_fn = lambda x, c, t: apply_folded(
                    folded, x, t,
                    use_pallas=resolve_sampler_mode(
                        fused, default_tpu_mode="packed"),
                    dtype=unet.dtype).astype(x.dtype)
            else:
                model_fn, _ = bind(params, stats, False)
                process.model_fn = model_fn
            # reference sampling(): the _reverse_diffusion(_with_clip) DDPM loop
            return process.ddpm_sample(rng, n, False, not no_clip)

        self._sample = jax.jit(sample, static_argnums=(3,))

    def init_state(self) -> DiffusionState:
        rng = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((1, self.img_size, self.img_size, self.channels),
                          jnp.float32)
        variables = self.unet.init(rng, dummy, None, jnp.zeros((1,), jnp.int32),
                                   train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        if bool(self.config.trainer.gaussiandiffusion3d.get("torch_init", True)):
            # torch Conv2d-default init (kaiming_uniform a=√5 + fan_in-uniform
            # bias): fresh-init convergence matches the reference recipe —
            # flax's lecun_normal/zero-bias default measured 704 vs 512 steps
            # to the same MSE bar (utils/init_utils.torch_like_reinit)
            from ..utils.init_utils import torch_like_reinit
            params = torch_like_reinit(params, jax.random.fold_in(rng, 1))
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
        self.logger.info("gaussiandiffusion3d U-Net params: %.1fM", n / 1e6)
        # EMA trees start as COPIES, not aliases: train_multi_step donates the
        # whole state, and donating the same underlying buffer twice (params
        # and ema_params sharing arrays at init) is an XLA Execute() error
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
        return DiffusionState(params=params, batch_stats=stats,
                              ema_params=copy(params),
                              ema_batch_stats=copy(stats),
                              opt_state=self.opt.init(params),
                              step=jnp.zeros((), jnp.int32))

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def generate_images(self, val_loader=None, n_samples: int = None, epoch: int = 0):
        n = n_samples or self.n_samples
        imgs = np.asarray(self._sample(self.state.ema_params,
                                       self.state.ema_batch_stats,
                                       self.next_rng(), n))
        imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
        save_image(make_grid(imgs, nrow=6),
                   os.path.join(self.run_dir, f"samples_epoch{epoch}.jpg"))
