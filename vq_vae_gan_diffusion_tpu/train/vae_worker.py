"""VAE worker (reference ``worker/vaeWorker.py``).

Loss (vaeWorker.py:114-140): MSE reconstruction (mean reduction) +
``kld_weight`` · KLD, where KLD = −½ Σ(1 + logσ² − µ² − σ²) / numel(imgs) —
note the reference normalizes the KLD *sum* by the number of image elements,
not latent elements; reproduced. Adam(lr, β=(0.5, 0.9), eps 1e-8)
(vaeWorker.py:103-112). Sampling: z ~ N(0, I) through the decoder
(vaeWorker.py:179-207).
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
from ..models import VAE
from ..utils import make_grid, save_gif, save_image
from .base import BaseWorker, maybe_accumulate


class VAEState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array


class VAEWorker(BaseWorker):
    model_name = "vae"

    def __init__(self, config: Config, run_dir: str, logger=None, mesh=None,
                 debug: bool = False, seed: int = 0, save_ckpt_dir=None,
                 dtype=jnp.float32):
        super().__init__(config, run_dir, logger, mesh, debug, seed, save_ckpt_dir)
        self.model = VAE.from_config(config, dtype=dtype)
        tr = config.trainer.get("vae", config.trainer.get("vqvae"))
        lr = float(tr.get("learning_rate", 2.25e-5))
        b1 = float(tr.get("beta1", 0.5))
        b2 = float(tr.get("beta2", 0.9))
        self.kld_weight = float(tr.get("kld_weight", 0.1))
        self.rec_loss_factor = float(tr.get("rec_loss_factor", 1.0))
        self.opt = maybe_accumulate(optax.adam(lr, b1=b1, b2=b2, eps=1e-8), tr)

        model, opt, kldw, recf = self.model, self.opt, self.kld_weight, self.rec_loss_factor

        @jax.jit
        def train_step(state: VAEState, imgs: jax.Array, rng: jax.Array):
            def loss_fn(params):
                decoded, mu, logvar = model.apply({"params": params}, imgs, rng,
                                                  deterministic=True)
                recon = jnp.mean((decoded - imgs) ** 2)
                mu32, lv32 = mu.astype(jnp.float32), logvar.astype(jnp.float32)
                kld = -0.5 * jnp.sum(1 + lv32 - mu32 ** 2 - jnp.exp(lv32)) / imgs.size
                loss = recf * recon + kldw * kld
                return loss, dict(recon_loss=recon, kld=kld, vae_loss=loss)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(params=new_params, opt_state=new_opt,
                                 step=state.step + 1), aux

        self._train_step = train_step

    def init_state(self) -> VAEState:
        rng = jax.random.PRNGKey(self.seed)
        img = self.model.img_size
        dummy = jnp.zeros((1, img, img, self.model.img_channels), jnp.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            params = self.model.init(rng, dummy, rng)["params"]
        params = jax.device_put(params, jax.devices()[0])
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
        self.logger.info("VAE params: %.1fM", n / 1e6)
        return VAEState(params=params, opt_state=self.opt.init(params),
                        step=jnp.zeros((), jnp.int32))

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def log_artifacts(self, batch, epoch: int, index: int) -> None:
        # device-side compute only; readback is batched per epoch and the
        # gif encode runs on the IO thread (see BaseWorker.queue_artifact)
        imgs = batch[:8]
        recon = self.jit_cached("recon", lambda p, x: self.model.apply(
            {"params": p}, x, jax.random.PRNGKey(0))[0])
        decoded = recon(self.state.params, jnp.asarray(imgs))

        def write(fetched):
            imgs_np, dec_np = fetched
            both = np.concatenate([self.to_uint8(imgs_np),
                                   self.to_uint8(dec_np)], axis=0)
            self.gif_frames.append(make_grid(both, nrow=8))
            save_gif(self.gif_frames,
                     os.path.join(self.run_dir, "reconstruction.gif"))
        self.queue_artifact((imgs, decoded), write)

    def sample(self, n_samples: int = 16, rng=None) -> np.ndarray:
        """z ~ N(0, I) → decoder (vaeWorker.py:179-207)."""
        rng = rng if rng is not None else self.next_rng()
        g = self.model.latent_size
        z = jax.random.normal(rng, (n_samples, g, g, self.model.latent_channels))
        decode = self.jit_cached("decode", lambda p, z: self.model.apply(
            {"params": p}, z, method=VAE.decode))
        return np.asarray(decode(self.state.params, z))

    def generate_images(self, val_loader=None, n_samples: int = 16, epoch: int = 0):
        samples = self.sample(n_samples)
        save_image(make_grid(self.to_uint8(samples), nrow=4),
                   os.path.join(self.run_dir, f"samples_epoch{epoch}.jpg"))
        if val_loader is not None:
            for batch in val_loader:
                imgs = jnp.asarray(batch[:n_samples])
                recon = self.jit_cached("recon", lambda p, x: self.model.apply(
                    {"params": p}, x, jax.random.PRNGKey(0))[0])
                decoded = recon(self.state.params, imgs)
                both = np.concatenate([self.to_uint8(np.asarray(imgs)),
                                       self.to_uint8(np.asarray(decoded))], axis=0)
                save_image(make_grid(both, nrow=n_samples),
                           os.path.join(self.run_dir, f"val_recon_epoch{epoch}.jpg"))
                break
