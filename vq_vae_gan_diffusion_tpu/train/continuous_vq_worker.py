"""Worker for the continuous c_/v_ VQ-diffusion variants.

The reference ships these models (network/continous_vq_diffusion/) without
wiring them to any entry point (SURVEY §2.4 — "capability present, config
layer incomplete"). Here they are first-class: ``model_name:
c_vqdiffusion | v_vqdiffusion`` trains the scalar-index / codebook-vector
diffusion prior over a frozen VQVAE with Adam, EMA, and per-epoch sampling.
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
from ..models.continuous_vq import C_VQDiffusion, V_VQDiffusion
from ..utils import ema_update, make_grid, save_image
from .base import BaseWorker, maybe_accumulate


class ContinuousVQState(struct.PyTreeNode):
    unet_params: Any
    vq_params: Any       # frozen
    ema_params: Any
    opt_state: Any
    step: jax.Array


class ContinuousVQDiffusionWorker(BaseWorker):
    def __init__(self, config: Config, run_dir: str, logger=None, mesh=None,
                 debug: bool = False, seed: int = 0, save_ckpt_dir=None,
                 dtype=jnp.float32):
        super().__init__(config, run_dir, logger, mesh, debug, seed, save_ckpt_dir)
        self.model_name = config.architecture.model_name
        cls = V_VQDiffusion if self.model_name.startswith("v_") else C_VQDiffusion
        self.composite = cls(config, dtype=dtype)
        tr = config.trainer.get(self.model_name, config.trainer.get("vqdiffusion"))
        lr = float(tr.get("learning_rate", 1e-4))
        self.opt = maybe_accumulate(
            optax.adam(lr, b1=float(tr.get("beta1", 0.9)),
                       b2=float(tr.get("beta2", 0.99))), tr)
        composite, opt = self.composite, self.opt

        @jax.jit
        def train_step(state: ContinuousVQState, imgs: jax.Array, rng: jax.Array):
            def loss_fn(p):
                return composite.loss(p, state.vq_params, imgs, rng)
            loss, grads = jax.value_and_grad(loss_fn)(state.unet_params)
            updates, new_opt = opt.update(grads, state.opt_state, state.unet_params)
            new_params = optax.apply_updates(state.unet_params, updates)
            new_ema = ema_update(state.ema_params, new_params, 0.999)
            return state.replace(unet_params=new_params, ema_params=new_ema,
                                 opt_state=new_opt, step=state.step + 1), \
                {"loss": loss}

        self._train_step = train_step
        self._sample = jax.jit(
            lambda p, vq, rng, n: composite.sample(p, vq, rng, n),
            static_argnums=(3,))

    def init_state(self) -> ContinuousVQState:
        rng = jax.random.PRNGKey(self.seed)
        c = self.composite
        vq = c.vqvae
        dummy_img = jnp.zeros((1, vq.img_size, vq.img_size, vq.img_channels),
                              jnp.float32)
        ch = (c.embedding_dim if isinstance(c, V_VQDiffusion)
              else c.indices_width)
        t0 = jnp.zeros((1,), jnp.int32)
        with jax.default_device(jax.devices("cpu")[0]):
            vq_params = vq.init(rng, dummy_img)["params"]
            dummy = jnp.zeros((1, c.seq_length, ch), jnp.float32)
            unet_params = c.unet.init(rng, dummy, None, t0)["params"]
        vq_params, unet_params = jax.device_put((vq_params, unet_params),
                                                jax.devices()[0])
        resume = self.config.architecture.vqvae.get("resume_path")
        if resume and os.path.exists(str(resume)):
            from ..utils import restore_checkpoint
            tree = restore_checkpoint(str(resume))
            try:
                vq_params = tree["state"]["vqvae_params"]
                self.logger.info("frozen VQVAE restored from %s", resume)
            except (KeyError, TypeError):
                pass
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(unet_params))
        self.logger.info("%s U-Net params: %.1fM", self.model_name, n / 1e6)
        # EMA starts as a copy, not an alias: the donating multi-step
        # dispatch may not donate the same buffer twice
        return ContinuousVQState(unet_params=unet_params, vq_params=vq_params,
                                 ema_params=jax.tree_util.tree_map(
                                     jnp.array, unet_params),
                                 opt_state=self.opt.init(unet_params),
                                 step=jnp.zeros((), jnp.int32))

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def generate_images(self, val_loader=None, n_samples: int = 16, epoch: int = 0):
        indices = self._sample(self.state.ema_params, self.state.vq_params,
                               self.next_rng(), n_samples)
        z2i = self.jit_cached("z2i", self.composite.z_to_image)
        imgs = z2i(self.state.vq_params, indices)
        save_image(make_grid(self.to_uint8(np.asarray(imgs)), nrow=4),
                   os.path.join(self.run_dir, f"samples_epoch{epoch}.jpg"))
