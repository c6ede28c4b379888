"""GaussianDiffusion3D + VQ wrapper (Conv2d ShuffleNet U-Net over a
[seq_len × gaussian_dim] "image" of per-token embeddings).

Parity with reference ``network/vqDiffusion/submodule/diffusion_gaussian3d.py``:

- cosine schedule (:134-138), ``_forward_diffusion`` (:141-145);
- ``_reverse_diffusion`` and ``_reverse_diffusion_with_clip`` updates
  (:148-198) including the t==0 special cases;
- DDPM/DDIM loops with ``return_all_timestamps`` filmstrips sampled every
  ``timesteps // 24`` steps (:98, :264-346);
- ELBO loss alternative (:349-402) and noise-MSE default;
- ``VQGaussianDiffusion3DWrapper`` (:463-617): sinusoidal positional-encoding
  lookup table [K, gaussian_dim] (:48-54, :513-515), forward = embed indices →
  diffuse → MSE, optional non-differentiable indices-recon auxiliary loss
  β=0.01 (:586-593), sample = reverse chain → cosine/L2 argmin decode.

Deliberate fixes (documented divergences from reference bugs):

- ``sample`` dispatches on ``sample_method`` ('ddpm'/'ddim') as the config
  intends; the reference's ``sample`` accidentally passes
  ``return_all_timestamps`` as ``clipped_reverse_diffusion`` and ignores the
  method (:600 vs :445).
- ``gaussian_to_indices`` uses L2-normalized copies for the cosine-distance
  argmin; the reference renormalizes its lookup-table buffer **in place** at
  sample time (:543-570), silently changing subsequent training targets.

Layout: the diffusion state is [B, seq_len, gaussian_dim, 1] (NHWC).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import _extract, make_schedule


def positional_encoding_table(dim: int, num_vectors: int) -> np.ndarray:
    """Sinusoidal PE lookup table (reference :48-54)."""
    position = np.arange(num_vectors)[:, None]
    div_term = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    pe = np.zeros((num_vectors, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)[:, : pe[:, 1::2].shape[1]]
    return pe


class GaussianDiffusion3D:
    """Pixel/embedding-space DDPM with the ShuffleNet U-Net (functional)."""

    NUM_TIMESTAMPS = 24  # filmstrip frames (reference :98)

    def __init__(self, image_sizes: Tuple[int, int], in_channels: int,
                 timesteps: int = 1000, sampling_timesteps: int = 500,
                 model_fn: Optional[Callable] = None,
                 loss_fn: str = "noise_mse", sample_method: str = "ddim",
                 ddim_sampling_eta: float = 0.0):
        assert loss_fn in ("noise_mse", "elbo")
        assert sample_method in ("ddim", "ddpm")
        self.image_sizes = tuple(image_sizes)
        self.in_channels = in_channels
        self.timesteps = timesteps
        self.sampling_timesteps = sampling_timesteps
        self.model_fn = model_fn  # model_fn(x, self_cond, t) -> pred noise
        self.loss_fn = loss_fn
        self.sample_method = sample_method
        self.ddim_sampling_eta = ddim_sampling_eta
        self.sched = make_schedule(timesteps, "cosine")

    # -- forward / loss ------------------------------------------------------
    def forward_diffusion(self, x0, t, noise):
        return (_extract(self.sched.sqrt_alphas_cumprod, t, x0.ndim) * x0 +
                _extract(self.sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise)

    def predict_start_from_noise(self, x_t, t, pred_noise):
        return (_extract(self.sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t -
                _extract(self.sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * pred_noise)

    def _q_posterior_ref(self, x0, x_t, t):
        """Reference's q_posterior (:200-218) — note its 'mean' uses the
        DDPM-update form with x0 in place of pred_noise, faithfully kept for
        the ELBO loss path."""
        alpha_t = _extract(self.sched.alphas, t, x_t.ndim)
        som = _extract(self.sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
        mean = (1.0 / jnp.sqrt(alpha_t)) * (x_t - ((1 - alpha_t) / som) * x0)
        beta_t = _extract(self.sched.betas, t, x_t.ndim)
        ac = _extract(self.sched.alphas_cumprod, t, x_t.ndim)
        ac_prev = _extract(self.sched.alphas_cumprod_prev, t, x_t.ndim)
        var = jnp.sqrt(beta_t * (1 - ac_prev) / (1 - ac))
        logvar = _extract(self.sched.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, jnp.maximum(var, 1e-20), logvar

    def loss(self, x0: jax.Array, rng: jax.Array) -> jax.Array:
        b = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, self.timesteps)
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)
        x_t = self.forward_diffusion(x0, t, noise)
        pred = self.model_fn(x_t, None, t)
        if self.loss_fn == "noise_mse":
            return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)
        # ELBO (:349-402)
        post_mean, post_var, post_logvar = self._q_posterior_ref(x0, x_t, t)
        pred_x0 = self.predict_start_from_noise(x_t, t, pred)
        model_mean, model_var, _ = self._q_posterior_ref(pred_x0, x_t, t)
        kl = 0.5 * (jnp.log(model_var) - jnp.log(post_var) +
                    (post_var + (post_mean - model_mean) ** 2) / model_var - 1)
        kl = jnp.mean(jnp.sum(kl, axis=tuple(range(1, kl.ndim))))
        nll = (0.5 * jnp.exp(-post_logvar) * (x_t - post_mean) ** 2 +
               0.5 * post_logvar)
        nll = jnp.mean(jnp.sum(nll, axis=tuple(range(1, nll.ndim))))
        return kl + nll

    # -- reverse updates ------------------------------------------------------
    def _reverse_step(self, x_t, t, noise, clipped: bool):
        b = x_t.shape[0]
        tb = jnp.full((b,), t, jnp.int32)
        pred = self.model_fn(x_t, None, tb)
        alpha_t = self.sched.alphas[t]
        ac = self.sched.alphas_cumprod[t]
        beta_t = self.sched.betas[t]
        ac_prev = self.sched.alphas_cumprod_prev[t]
        std = jnp.where(t > 0, jnp.sqrt(beta_t * (1 - ac_prev) / (1 - ac)), 0.0)
        if not clipped:
            som = self.sched.sqrt_one_minus_alphas_cumprod[t]
            mean = (1.0 / jnp.sqrt(alpha_t)) * (x_t - ((1 - alpha_t) / som) * pred)
        else:
            x0 = (jnp.sqrt(1.0 / ac) * x_t - jnp.sqrt(1.0 / ac - 1.0) * pred)
            x0 = jnp.clip(x0, -1.0, 1.0)
            mean_t = (beta_t * jnp.sqrt(ac_prev) / (1 - ac)) * x0 + \
                     ((1 - ac_prev) * jnp.sqrt(alpha_t) / (1 - ac)) * x_t
            mean_0 = (beta_t / (1 - ac)) * x0
            mean = jnp.where(t > 0, mean_t, mean_0)
        return mean + std * noise

    # -- samplers --------------------------------------------------------------
    def _film_slots(self, n_steps: int) -> int:
        return max(n_steps // self.NUM_TIMESTAMPS, 1)

    def ddpm_sample(self, rng: jax.Array, n_samples: int,
                    return_all_timestamps: bool = False,
                    clipped_reverse_diffusion: bool = True):
        h, w = self.image_sizes
        rng, sub = jax.random.split(rng)
        x_t = jax.random.normal(sub, (n_samples, h, w, self.in_channels))
        save_step = self._film_slots(self.timesteps)

        def body(carry, t):
            x, rng = carry
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            x = self._reverse_step(x, t, noise, clipped_reverse_diffusion)
            return (x, rng), (x if return_all_timestamps else None)

        (x, _), frames = jax.lax.scan(body, (x_t, rng),
                                      jnp.arange(self.timesteps - 1, -1, -1))
        x = (x + 1.0) / 2.0
        if return_all_timestamps:
            keep = frames[::-save_step][::-1]  # every save_step-th, ending at t=0
            return x, (keep + 1.0) / 2.0
        return x

    def ddim_sample(self, rng: jax.Array, n_samples: int,
                    return_all_timestamps: bool = False,
                    clipped_reverse_diffusion: bool = True):
        h, w = self.image_sizes
        rng, sub = jax.random.split(rng)
        img = jax.random.normal(sub, (n_samples, h, w, self.in_channels))
        # reference uses linspace(-1, T-1, steps=S) here (not S+1, :292)
        times = np.linspace(-1, self.timesteps - 1, self.sampling_timesteps)
        times = np.asarray(list(reversed(times.astype(int).tolist())), np.int32)
        pairs = jnp.stack([jnp.asarray(times[:-1]), jnp.asarray(times[1:])], 1)
        eta = self.ddim_sampling_eta

        def body(carry, pair):
            x, rng = carry
            time, time_next = pair[0], pair[1]
            rng, sub = jax.random.split(rng)
            tb = jnp.full((n_samples,), time, jnp.int32)
            pred_noise = self.model_fn(x, None, tb)
            x_start = self.predict_start_from_noise(x, tb, pred_noise)
            if clipped_reverse_diffusion:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            at = self.sched.alphas_cumprod[time]
            at1 = self.sched.alphas_cumprod[jnp.maximum(time_next, 0)]
            sigma = eta * jnp.sqrt((1 - at / at1) * (1 - at1) / (1 - at))
            c = jnp.sqrt(jnp.maximum(1 - at1 - sigma ** 2, 0.0))
            noise = jax.random.normal(sub, x.shape, x.dtype)
            upd = x_start * jnp.sqrt(at1) + c * pred_noise + sigma * noise
            x = jnp.where(time_next < 0, x_start, upd)
            return (x, rng), (x if return_all_timestamps else None)

        (img, _), frames = jax.lax.scan(body, (img, rng), pairs)
        img = (img + 1.0) / 2.0
        if return_all_timestamps:
            save_step = self._film_slots(self.sampling_timesteps)
            keep = frames[::-save_step][::-1]
            return img, (keep + 1.0) / 2.0
        return img

    def sampling(self, rng: jax.Array, n_samples: int,
                 return_all_timestamps: bool = False,
                 clipped_reverse_diffusion: bool = True):
        fn = self.ddim_sample if self.sample_method == "ddim" else self.ddpm_sample
        return fn(rng, n_samples, return_all_timestamps, clipped_reverse_diffusion)


class VQGaussianDiffusion3D:
    """Reference VQGaussianDiffusion3DWrapper (functional)."""

    BELTA = 0.01  # reference's aux-loss weight spelling included (:496)

    def __init__(self, seq_length: int = 256, timesteps: int = 1000,
                 sampling_timesteps: int = 500, vocab_size: int = 1024,
                 gaussian_dim: int = 512, model_fn: Optional[Callable] = None,
                 sample_method: str = "ddim", loss_fn: str = "noise_mse",
                 return_all_timestamps: bool = False,
                 clipped_reverse_diffusion: bool = False,
                 compute_indices_recon_loss: bool = False):
        self.seq_length = seq_length
        self.vocab_size = vocab_size
        self.gaussian_dim = gaussian_dim
        self.return_all_timestamps = return_all_timestamps
        self.clipped_reverse_diffusion = clipped_reverse_diffusion
        self.compute_indices_recon_loss = compute_indices_recon_loss
        self.diffusion = GaussianDiffusion3D(
            (seq_length, gaussian_dim), 1, timesteps, sampling_timesteps,
            model_fn, loss_fn, sample_method)
        self.lookup_table = jnp.asarray(
            positional_encoding_table(gaussian_dim, vocab_size))
        norm = jnp.linalg.norm(self.lookup_table, axis=-1, keepdims=True)
        self._lookup_normed = self.lookup_table / jnp.maximum(norm, 1e-12)

    def indices_to_gaussian(self, indices: jax.Array) -> jax.Array:
        return jnp.take(self.lookup_table, indices, axis=0)

    def gaussian_to_indices(self, gaussian: jax.Array) -> jax.Array:
        """Cosine-distance argmin decode (:543-570) on normalized copies."""
        if gaussian.ndim == 4:
            gaussian = gaussian[..., 0] if gaussian.shape[-1] == 1 else gaussian.squeeze(1)
        b, n, d = gaussian.shape
        flat = gaussian.reshape(-1, d)
        flat = flat / jnp.maximum(jnp.linalg.norm(flat, axis=-1, keepdims=True), 1e-12)
        sim = jnp.dot(flat, self._lookup_normed.T,
                      preferred_element_type=jnp.float32)
        return jnp.argmax(sim, axis=-1).reshape(b, n)  # min cosine distance

    def loss(self, indices_x0: jax.Array, rng: jax.Array):
        x0 = self.indices_to_gaussian(indices_x0)[..., None]  # [B, N, D, 1]
        b = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, self.diffusion.timesteps)
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)
        x_t = self.diffusion.forward_diffusion(x0, t, noise)
        pred = self.diffusion.model_fn(x_t, None, t)
        loss = jnp.mean((pred.astype(jnp.float32) - noise) ** 2)
        metrics = {"noise_mse": loss}
        if self.compute_indices_recon_loss:
            pred_x0 = self.diffusion.predict_start_from_noise(x_t, t, pred)
            pred_idx = self.gaussian_to_indices(pred_x0)
            # argmin is non-differentiable: this term shifts the loss value but
            # contributes no gradient — exactly as in the reference (:586-593)
            recon = jnp.mean((pred_idx.astype(jnp.float32) -
                              indices_x0.astype(jnp.float32)) ** 2)
            loss = loss + self.BELTA * recon
            metrics["indices_recon"] = recon
        metrics["loss"] = loss
        return loss, metrics

    def sample(self, rng: jax.Array, batch_size: int = 16):
        out = self.diffusion.sampling(rng, batch_size, self.return_all_timestamps,
                                      self.clipped_reverse_diffusion)
        if self.return_all_timestamps:
            final, frames = out
            # frames: [F, B, N, D, 1] → per-frame indices [B, F, N]
            idx_frames = jax.vmap(self.gaussian_to_indices)(frames * 2.0 - 1.0)
            return jnp.swapaxes(idx_frames, 0, 1)
        # samples come back unnormalized to [0,1]; decode expects embedding space
        return self.gaussian_to_indices(out * 2.0 - 1.0)
