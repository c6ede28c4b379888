"""Continuous VQ-diffusion variants (reference ``network/continous_vq_diffusion/``).

``V_VQDiffusion`` (v_vq_diffusion.py:10-125): diffuse the actual codebook
vectors — frozen VQVAE encode → indices → codebook embeddings
[B, D, N] → Gaussian diffusion (linear schedule ``DiffusionModel``) with a
Conv1d U-Net (channels = embedding dim); sample = DDIM(500) from noise →
nearest-codebook L2 argmin per position.

``C_VQDiffusion`` (c_vq_diffusion.py:18-187): the deliberately naive scalar
baseline — indices normalized to [0,1], tiled to ``indices_width`` rows,
diffused; sample = DDIM → row-mean → ×K → clamp → int.

Config parity note (SURVEY §2.4): the reference reads
``architecture.vqvae.num_latent_vec`` / ``latent_vec_dim`` keys that exist in
no shipped YAML — capability present, config incomplete. We default them to
the actual ``latent_size²`` / ``latent_channels`` and honor the keys when
present.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..config import Config
from ..diffusion.gaussian import (ddim_sample, diffusion_loss, make_schedule)
from .unet1d import Unet1D
from .vqvae import VQVAE


class _ContinuousVQBase:
    def __init__(self, cfg: Config, dtype=jnp.float32):
        self.vqvae = VQVAE.from_config(cfg, dtype=dtype)
        vq = cfg.architecture.vqvae
        self.seq_length = int(vq.get("num_latent_vec", self.vqvae.latent_size ** 2))
        self.embedding_dim = int(vq.get("latent_vec_dim", self.vqvae.latent_channels))
        self.codebook_size = int(vq.num_codebook_vectors)
        model_name = cfg.architecture.model_name
        dcfg = cfg.architecture.get(model_name, cfg.architecture.get("vqdiffusion"))
        self.timesteps = int(dcfg.get("diffusion_steps", 1000))
        self.sampling_timesteps = int(dcfg.get("sampling_steps", 500))
        self.objective = str(dcfg.get("objective", "pred_noise"))
        self.sched = make_schedule(self.timesteps, "linear")
        self.dtype = dtype
        # reference hardcodes dim 64 / (1,2,4,8); knobs for tiny CI configs
        self.unet_base_dim = int(dcfg.get("unet_base_dim", 64))
        self.unet_dim_mults = tuple(dcfg.get("unet_dim_mults", (1, 2, 4, 8)))

    def encode_to_z(self, vq_params, x: jax.Array) -> jax.Array:
        _, indices, _ = self.vqvae.apply({"params": vq_params}, x,
                                         method=VQVAE.encode)
        return jax.lax.stop_gradient(indices.reshape(x.shape[0], -1))

    def z_to_image(self, vq_params, indices: jax.Array) -> jax.Array:
        return self.vqvae.apply({"params": vq_params}, indices,
                                method=VQVAE.decode_indices)

    def _unet1d_fn(self, unet, params) -> Callable:
        def model_fn(x, cond, t):
            # torch [B, C, L] → flax [B, L, C]
            out = unet.apply({"params": params}, jnp.swapaxes(x, 1, 2), cond, t)
            return jnp.swapaxes(out, 1, 2)
        return model_fn

    def log_images(self, vq_params, x: jax.Array) -> Dict[str, jax.Array]:
        x = x[:4]
        indices = self.encode_to_z(vq_params, x)
        return {"input": x, "rec": self.z_to_image(vq_params, indices)}


class V_VQDiffusion(_ContinuousVQBase):
    def __init__(self, cfg: Config, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        self.unet = Unet1D(dim=self.unet_base_dim, dim_mults=self.unet_dim_mults,
                           channels=self.embedding_dim, condition=True,
                           dtype=dtype)

    def loss(self, unet_params, vq_params, x: jax.Array, rng: jax.Array):
        indices = self.encode_to_z(vq_params, x)
        codebook = vq_params["codebook"]["embedding"]
        emb = jnp.take(codebook, indices, axis=0)           # [B, N, D]
        emb = jnp.swapaxes(emb, 1, 2)                       # [B, D, N] torch layout
        b = emb.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, self.timesteps)
        noise = jax.random.normal(rng_n, emb.shape)
        loss, _ = diffusion_loss(self.sched, self._unet1d_fn(self.unet, unet_params),
                                 emb, None, t, noise, self.objective)
        return loss

    def sample(self, unet_params, vq_params, rng: jax.Array,
               batch_size: int = 1) -> jax.Array:
        rng_i, rng_s = jax.random.split(rng)
        x_t = jax.random.normal(rng_i, (batch_size, self.embedding_dim,
                                        self.seq_length))
        emb = ddim_sample(self.sched, self._unet1d_fn(self.unet, unet_params),
                          rng_s, x_t, eta=0.0,
                          sampling_timesteps=min(self.sampling_timesteps, 500),
                          objective=self.objective)
        emb = jnp.swapaxes(emb, 1, 2)                       # [B, N, D]
        codebook = vq_params["codebook"]["embedding"]       # [K, D]
        d = (jnp.sum(emb ** 2, -1, keepdims=True)
             + jnp.sum(codebook ** 2, -1)
             - 2 * jnp.einsum("bnd,kd->bnk", emb, codebook,
                              preferred_element_type=jnp.float32))
        return jnp.argmin(d, axis=-1)


class C_VQDiffusion(_ContinuousVQBase):
    def __init__(self, cfg: Config, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        model_name = cfg.architecture.model_name
        dcfg = cfg.architecture.get(model_name, cfg.architecture.get("vqdiffusion"))
        self.indices_width = int(dcfg.get("indices_width", 8))
        self.unet = Unet1D(dim=self.unet_base_dim, dim_mults=self.unet_dim_mults,
                           channels=self.indices_width, condition=True,
                           dtype=dtype)

    def loss(self, unet_params, vq_params, x: jax.Array, rng: jax.Array):
        indices = self.encode_to_z(vq_params, x)            # [B, N]
        rows = jnp.broadcast_to(indices[:, None, :].astype(jnp.float32),
                                (indices.shape[0], self.indices_width,
                                 indices.shape[1]))
        rows = rows / self.codebook_size
        b = rows.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, self.timesteps)
        noise = jax.random.normal(rng_n, rows.shape)
        loss, _ = diffusion_loss(self.sched, self._unet1d_fn(self.unet, unet_params),
                                 rows, None, t, noise, self.objective)
        return loss

    def sample(self, unet_params, vq_params, rng: jax.Array,
               batch_size: int = 1) -> jax.Array:
        rng_i, rng_s = jax.random.split(rng)
        x_t = jax.random.normal(rng_i, (batch_size, self.indices_width,
                                        self.seq_length))
        rows = ddim_sample(self.sched, self._unet1d_fn(self.unet, unet_params),
                           rng_s, x_t, eta=0.0,
                           sampling_timesteps=min(self.sampling_timesteps, 500),
                           objective=self.objective)
        vals = jnp.mean(rows, axis=1) * self.codebook_size
        return jnp.clip(vals, 0, self.codebook_size - 1).astype(jnp.int32)
