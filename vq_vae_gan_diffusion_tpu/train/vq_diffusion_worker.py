"""Stage-2 diffusion worker (reference ``worker/vqdiffusionWorker.py``).

- AdamW + torch-exact OneCycleLR (:120-122) via
  ``utils.schedules.torch_onecycle_schedules`` — including torch's default
  momentum cycling, which overrides the configured β₁ (see the quirk note at
  the optimizer construction below);
- EMA of the prior every ``model_ema_steps`` with batch-adjusted decay
  (:80-83): adjust = batch_size·ema_steps/num_epochs, α = min(1, (1−decay)·adjust);
- per-epoch sampling including the all-timesteps filmstrip when
  ``return_all_timestamps`` (:192-228);
- checkpoint dict {diffusion, optimizer, scheduler-step, global_step, epoch}
  with symmetric resume (:230-249, 85-100) — here one orbax tree.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config
from ..utils.schedules import torch_onecycle_schedules
from ..diffusion.discrete import LtState
from ..models.vq_diffusion_composite import VQDiffusionComposite
from ..utils import ema_update, make_grid, save_image
from .base import BaseWorker, maybe_accumulate


class VQDiffusionState(struct.PyTreeNode):
    unet_params: Any
    unet_batch_stats: Any
    vq_params: Any               # frozen
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any
    lt_state: Any                # LtState for VQ_Official, () otherwise
    step: jax.Array


class VQDiffusionWorker(BaseWorker):
    def __init__(self, config: Config, run_dir: str, logger=None, mesh=None,
                 debug: bool = False, seed: int = 0, save_ckpt_dir=None,
                 dtype=jnp.float32, num_iters_per_epoch: int = 100):
        super().__init__(config, run_dir, logger, mesh, debug, seed, save_ckpt_dir)
        self.model_name = config.architecture.model_name
        self.composite = VQDiffusionComposite(config, dtype=dtype)
        tr = config.trainer.get("vqdiffusion")
        lr = float(tr.learning_rate)
        b1, b2 = float(tr.beta1), float(tr.beta2)
        self.model_ema_steps = int(tr.get("model_ema_steps", 10))
        base_decay = float(tr.get("model_ema_decay", 0.995))
        num_epochs = int(config.trainer.num_epochs)
        from ..config import resolve_batch_size
        batch_size = resolve_batch_size(config)
        alpha = min(1.0, (1.0 - base_decay) * batch_size * self.model_ema_steps
                    / max(num_epochs, 1))
        self.ema_decay = 1.0 - alpha
        total_steps = max(num_epochs * num_iters_per_epoch, 10)
        # torch-exact OneCycleLR. Reference quirk reproduced: OneCycleLR's
        # default cycle_momentum=True OVERRIDES the configured β₁ (0.65 in the
        # shipped config) with its 0.95↔0.85 momentum cycle from step 0
        # (vqdiffusionWorker.py:120-122) — so `beta1` from the config is
        # deliberately unused here, exactly like the reference. β₂ is kept.
        lr_fn, b1_fn = torch_onecycle_schedules(total_steps, lr)
        del b1  # documented-unused (see quirk note above)
        self.opt = maybe_accumulate(optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_fn, b1=b1_fn, b2=b2, weight_decay=0.01), tr)

        composite, opt, ema_steps, ema_decay = (self.composite, self.opt,
                                                self.model_ema_steps, self.ema_decay)

        @jax.jit
        def train_step(state: VQDiffusionState, imgs: jax.Array, rng: jax.Array):
            def loss_fn(unet_params):
                loss, metrics, new_stats, new_lt = composite.loss(
                    unet_params, state.vq_params, state.unet_batch_stats,
                    state.lt_state if isinstance(state.lt_state, LtState) else None,
                    imgs, rng)
                return loss, (metrics, new_stats, new_lt)

            (loss, (metrics, new_stats, new_lt)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.unet_params)
            updates, new_opt = opt.update(grads, state.opt_state, state.unet_params)
            new_params = optax.apply_updates(state.unet_params, updates)

            do_ema = (state.step % ema_steps) == 0
            decay = jnp.where(do_ema, ema_decay, 1.0)
            new_ema = ema_update(state.ema_params, new_params, decay)
            new_ema_stats = jax.tree_util.tree_map(
                lambda e, p: jnp.where(do_ema, p, e).astype(e.dtype),
                state.ema_batch_stats, new_stats if new_stats else {})

            return state.replace(
                unet_params=new_params,
                unet_batch_stats=new_stats if new_stats else {},
                ema_params=new_ema, ema_batch_stats=new_ema_stats,
                opt_state=new_opt,
                lt_state=new_lt if new_lt is not None else state.lt_state,
                step=state.step + 1), {**metrics, "loss": loss}

        self._train_step = train_step
        self._sample = jax.jit(
            lambda params, stats, rng, n: composite.sample(params, stats, rng, n),
            static_argnums=(3,))

    def init_state(self) -> VQDiffusionState:
        rng = jax.random.PRNGKey(self.seed)
        c = self.composite
        vq = c.vqvae
        dummy_img = jnp.zeros((1, vq.img_size, vq.img_size, vq.img_channels),
                              jnp.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            vq_params = vq.init(rng, dummy_img)["params"]
        vq_params = jax.device_put(vq_params, jax.devices()[0])
        resume = self.config.architecture.vqvae.get("resume_path")
        if resume and os.path.exists(str(resume)):
            from ..utils import restore_checkpoint
            tree = restore_checkpoint(str(resume))
            try:
                vq_params = tree["state"]["vqvae_params"]
                self.logger.info("frozen VQVAE restored from %s", resume)
            except (KeyError, TypeError):
                self.logger.warning("could not extract vqvae_params from %s", resume)

        # init the U-Net with the shape the prior feeds it
        K, N, D = c.codebook_size, c.seq_len, c.gaussian_dim
        t0 = jnp.zeros((1,), jnp.int32)
        if c.diffusion_type == "VQ_Official" and c._unet_kind == "1d":
            dummy = jnp.zeros((1, N, K), jnp.float32)
            variables = c.unet.init(rng, dummy, None, t0)
        elif c._unet_kind == "1d":  # gaussiandiffusion2d
            ch = (K if c.indices_to_dist_fn == "one_hot" else D) \
                if c.distribute_dim == 1 else N
            length = (N if c.distribute_dim == 1
                      else (K if c.indices_to_dist_fn == "one_hot" else D))
            dummy = jnp.zeros((1, length, ch), jnp.float32)
            variables = c.unet.init(rng, dummy, None, t0)
        elif c.diffusion_type == "VQ_Official":
            dummy = jnp.zeros((1, K, N, 1), jnp.float32)
            variables = c.unet.init(rng, dummy, None, t0, train=False)
        else:  # gaussiandiffusion3d
            dummy = jnp.zeros((1, N, D, 1), jnp.float32)
            variables = c.unet.init(rng, dummy, None, t0, train=False)
        unet_params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(unet_params))
        self.logger.info("diffusion prior params: %.1fM (%s)", n / 1e6,
                         c.diffusion_type)
        lt = (LtState.init(c.timesteps)
              if c.diffusion_type == "VQ_Official" else ())
        # EMA trees start as copies, not aliases (donation safety)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
        return VQDiffusionState(
            unet_params=unet_params, unet_batch_stats=batch_stats,
            vq_params=vq_params, ema_params=copy(unet_params),
            ema_batch_stats=copy(batch_stats), opt_state=self.opt.init(unet_params),
            lt_state=lt, step=jnp.zeros((), jnp.int32))

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def log_artifacts(self, batch, epoch: int, index: int) -> None:
        # device-side compute only; readback batched per epoch, file write on
        # the IO thread (BaseWorker.queue_artifact)
        logs = self.composite.log_images(self.state.unet_params,
                                         self.state.vq_params, jnp.asarray(batch))

        def write(fetched):
            rows = [self.to_uint8(fetched[k]) for k in ("input", "rec")]
            save_image(make_grid(np.concatenate(rows, 0), nrow=4),
                       os.path.join(self.run_dir,
                                    f"recon_epoch{epoch}_{index}.jpg"))
        self.queue_artifact(logs, write)

    def generate_images(self, val_loader=None, n_samples: int = 16, epoch: int = 0):
        indices = self._sample(self.state.ema_params, self.state.ema_batch_stats,
                               self.next_rng(), n_samples)
        if indices.ndim == 3:  # filmstrip [B, F, N]
            b, f, n = indices.shape
            frames = []
            for i in range(f):
                z2i = self.jit_cached("z2i", self.composite.z_to_image)
                imgs = z2i(self.state.vq_params, indices[:, i])
                frames.append(self.to_uint8(np.asarray(imgs[0])))
            save_image(make_grid(np.stack(frames), nrow=8),
                       os.path.join(self.run_dir, f"filmstrip_epoch{epoch}.jpg"))
            indices = indices[:, -1]
        imgs = self.jit_cached("z2i", self.composite.z_to_image)(
            self.state.vq_params, indices)
        save_image(make_grid(self.to_uint8(np.asarray(imgs)), nrow=4),
                   os.path.join(self.run_dir, f"samples_epoch{epoch}.jpg"))
