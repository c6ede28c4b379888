"""Continuous Gaussian diffusion over token sequences ("GaussianDiffusion2D").

Parity with reference ``network/vqDiffusion/submodule/diffusion_gaussian2d.py``:

- cosine β schedule (:87-97, via :mod:`.schedules`);
- index → continuous maps (:307-320): smoothed one-hot (smoothing 0.1) or a
  **fixed uniform-random** lookup table ``U(0,1)^{K×gaussian_dim}`` (:287);
- inverse maps (:322-347): argmax for one-hot, explicit L2-argmin matmul for
  lookup_table;
- ``distribute_dim``: -1 keeps [B, N, D]; 1 moves the distribution to the
  channel axis — in our channels-last layout that means the *sequence* axis is
  treated as channels, i.e. the array is transposed before the U-Net;
- training ``p_losses`` (:557-585): MSE(pred, noise) per-sample mean × SNR
  loss-weight (ones for pred_noise), self-conditioning 50% of the time;
- sampling (:432-526): DDPM loop or DDIM with clip_x_start=True; the reference
  *always* uses ``ddim_sample`` in ``sample`` (:522-526) and starts the chain
  from the continuous embedding of RANDOM indices rather than pure noise
  (:470-480 — reproduced);
- both loops run here as ``lax.scan``.

The lookup table is a fixed buffer, passed in as part of the process state.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .gaussian import (ddim_times, make_schedule, model_predictions,
                       q_posterior, q_sample)


class GaussianDiffusion2DConfig(NamedTuple):
    seq_length: int = 256
    timesteps: int = 1000
    sampling_timesteps: int = 1000
    objective: str = "pred_noise"
    ddim_sampling_eta: float = 0.0
    vocab_size: int = 1024
    distribute_dim: int = -1
    gaussian_dim: int = 512
    indices_to_dist_fn: str = "lookup_table"
    diffusion_type: str = "vqdiffusion"   # or 'gaussiandiffusion2d' (raw seqs)
    self_condition: bool = False


class GaussianDiffusion2D:
    """Functional process: model params are passed to each call via model_fn."""

    def __init__(self, cfg: GaussianDiffusion2DConfig,
                 model_fn: Callable, lookup_rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.model_fn = model_fn  # model_fn(x, self_cond, t) -> prediction
        self.sched = make_schedule(cfg.timesteps, "cosine")
        if cfg.diffusion_type == "vqdiffusion":
            rng = lookup_rng if lookup_rng is not None else jax.random.PRNGKey(0)
            # reference buffer: torch.rand(K, gaussian_dim) (:287)
            self.lookup_table = jax.random.uniform(
                rng, (cfg.vocab_size, cfg.gaussian_dim), jnp.float32)
        else:
            self.lookup_table = None

    # -- index <-> continuous maps ------------------------------------------
    def indices_to_smooth_onehot(self, x0: jax.Array, smoothing: float = 0.1):
        onehot = jax.nn.one_hot(x0, self.cfg.vocab_size, dtype=jnp.float32)
        if self.cfg.distribute_dim == 1:
            onehot = jnp.swapaxes(onehot, 1, 2)
        return onehot * (1 - smoothing) + smoothing / self.cfg.vocab_size

    def onehot_to_indices(self, onehot: jax.Array) -> jax.Array:
        if self.cfg.distribute_dim == 1:
            onehot = jnp.swapaxes(onehot, 1, 2)
        return jnp.argmax(onehot, axis=-1)

    def indices_to_gaussian(self, indices: jax.Array) -> jax.Array:
        x = jnp.take(self.lookup_table, indices, axis=0)
        if self.cfg.distribute_dim == 1:
            x = jnp.swapaxes(x, 1, 2)
        return x

    def gaussian_to_indices(self, gaussian: jax.Array) -> jax.Array:
        if self.cfg.distribute_dim == 1:
            gaussian = jnp.swapaxes(gaussian, 1, 2)
        b, n, d = gaussian.shape
        flat = gaussian.reshape(-1, d)
        dist = (jnp.sum(flat ** 2, -1, keepdims=True)
                + jnp.sum(self.lookup_table ** 2, -1)
                - 2 * jnp.dot(flat, self.lookup_table.T,
                              preferred_element_type=jnp.float32))
        return jnp.argmin(dist, axis=-1).reshape(b, n)

    def to_continuous(self, indices: jax.Array) -> jax.Array:
        if self.cfg.indices_to_dist_fn == "lookup_table":
            return self.indices_to_gaussian(indices)
        return self.indices_to_smooth_onehot(indices)

    def to_indices(self, x: jax.Array) -> jax.Array:
        if self.cfg.indices_to_dist_fn == "lookup_table":
            return self.gaussian_to_indices(x)
        return self.onehot_to_indices(x)

    # -- training ------------------------------------------------------------
    def loss(self, x0_indices_or_seq: jax.Array, rng: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.diffusion_type == "vqdiffusion":
            x0 = self.to_continuous(x0_indices_or_seq)
        else:
            x0 = x0_indices_or_seq
        b = x0.shape[0]
        rng_t, rng_noise, rng_sc, rng_scflip = jax.random.split(rng, 4)
        t = jax.random.randint(rng_t, (b,), 0, cfg.timesteps)
        noise = jax.random.normal(rng_noise, x0.shape, jnp.float32)
        x_t = q_sample(self.sched, x0, t, noise)

        x_self_cond = None
        if cfg.self_condition:
            def make_sc():
                _, x_start = model_predictions(self.sched, self.model_fn, x_t,
                                               None, t, cfg.objective)
                return jax.lax.stop_gradient(x_start)
            use_sc = jax.random.bernoulli(rng_scflip, 0.5)
            # scalar-pred lax.cond: the extra denoiser forward runs only on
            # the 50% of steps that actually use it (reference's python-level
            # coin, diffusion_gaussian2d.py:568-572)
            x_self_cond = jax.lax.cond(use_sc, make_sc,
                                       lambda: jnp.zeros_like(x_t))

        out = self.model_fn(x_t, x_self_cond, t)
        per = jnp.mean((out.astype(jnp.float32) - noise) ** 2,
                       axis=tuple(range(1, out.ndim)))
        # loss_weight is ones for pred_noise (:294-300)
        return jnp.mean(per)

    # -- sampling --------------------------------------------------------------
    def _chain_start(self, rng: jax.Array, batch_size: int,
                     xt: Optional[jax.Array]) -> jax.Array:
        cfg = self.cfg
        if cfg.diffusion_type == "vqdiffusion":
            idx = jax.random.randint(rng, (batch_size, cfg.seq_length), 0,
                                     cfg.vocab_size)
            return self.to_continuous(idx)
        assert xt is not None, "raw-sequence mode needs an initial x_t"
        return xt

    def ddim_sample(self, rng: jax.Array, batch_size: int = 16,
                    xt: Optional[jax.Array] = None,
                    clip_denoised: bool = True) -> jax.Array:
        cfg = self.cfg
        rng_init, rng_loop = jax.random.split(rng)
        img = self._chain_start(rng_init, batch_size, xt)
        times = ddim_times(cfg.timesteps, cfg.sampling_timesteps)
        pairs = jnp.stack([jnp.asarray(times[:-1]), jnp.asarray(times[1:])], 1)

        def body(carry, pair):
            x, rng = carry
            time, time_next = pair[0], pair[1]
            rng, sub = jax.random.split(rng)
            tb = jnp.full((batch_size,), time, jnp.int32)
            pred_noise, x_start = model_predictions(
                self.sched, self.model_fn, x, None, tb, cfg.objective,
                clip_x_start=clip_denoised)
            at = self.sched.alphas_cumprod[time]
            at1 = self.sched.alphas_cumprod[jnp.maximum(time_next, 0)]
            sigma = cfg.ddim_sampling_eta * jnp.sqrt(
                (1 - at / at1) * (1 - at1) / (1 - at))
            c = jnp.sqrt(jnp.maximum(1 - at1 - sigma ** 2, 0.0))
            noise = jax.random.normal(sub, x.shape, x.dtype)
            upd = x_start * jnp.sqrt(at1) + c * pred_noise + sigma * noise
            x = jnp.where(time_next < 0, x_start, upd)
            return (x, rng), None

        (img, _), _ = jax.lax.scan(body, (img, rng_loop), pairs)
        if cfg.diffusion_type == "vqdiffusion":
            return self.to_indices(img)
        return img

    def p_sample_loop(self, rng: jax.Array, batch_size: int = 16,
                      xt: Optional[jax.Array] = None,
                      clip_denoised: bool = True) -> jax.Array:
        cfg = self.cfg
        rng_init, rng_loop = jax.random.split(rng)
        img = self._chain_start(rng_init, batch_size, xt)

        def body(carry, t):
            x, rng = carry
            rng, sub = jax.random.split(rng)
            tb = jnp.full((batch_size,), t, jnp.int32)
            _, x_start = model_predictions(self.sched, self.model_fn, x, None,
                                           tb, cfg.objective,
                                           clip_x_start=clip_denoised)
            mean, _, logvar = q_posterior(self.sched, x_start, x, tb)
            z = jnp.where(t > 0, jax.random.normal(sub, x.shape, x.dtype), 0.0)
            x = mean + jnp.exp(0.5 * logvar) * z
            return (x, rng), None

        (img, _), _ = jax.lax.scan(body, (img, rng_loop),
                                   jnp.arange(cfg.timesteps - 1, -1, -1))
        if cfg.diffusion_type == "vqdiffusion":
            return self.to_indices(img)
        return img

    def sample(self, rng: jax.Array, batch_size: int = 16,
               xt: Optional[jax.Array] = None) -> jax.Array:
        # reference always routes through ddim_sample (:522-526)
        return self.ddim_sample(rng, batch_size, xt)

    def interpolate(self, rng: jax.Array, x1: jax.Array, x2: jax.Array,
                    t: Optional[int] = None, lam: float = 0.5) -> jax.Array:
        """Reference interpolate (:528-546): q_sample both, lerp, denoise from t."""
        cfg = self.cfg
        t = t if t is not None else cfg.timesteps - 1
        rng_n1, rng_n2, rng_loop = jax.random.split(rng, 3)
        tb = jnp.full((x1.shape[0],), t, jnp.int32)
        xt1 = q_sample(self.sched, x1, tb, jax.random.normal(rng_n1, x1.shape))
        xt2 = q_sample(self.sched, x2, tb, jax.random.normal(rng_n2, x2.shape))
        img = (1 - lam) * xt1 + lam * xt2

        def body(carry, i):
            x, rng = carry
            rng, sub = jax.random.split(rng)
            ib = jnp.full((x.shape[0],), i, jnp.int32)
            _, x_start = model_predictions(self.sched, self.model_fn, x, None,
                                           ib, cfg.objective, clip_x_start=True)
            mean, _, logvar = q_posterior(self.sched, x_start, x, ib)
            z = jnp.where(i > 0, jax.random.normal(sub, x.shape, x.dtype), 0.0)
            return (mean + jnp.exp(0.5 * logvar) * z, rng), None

        (img, _), _ = jax.lax.scan(body, (img, rng_loop),
                                   jnp.arange(t - 1, -1, -1))
        return img
