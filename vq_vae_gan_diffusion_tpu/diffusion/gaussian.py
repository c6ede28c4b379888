"""Gaussian diffusion core: q-sampling, prediction conversions, DDPM/DDIM
reverse loops as on-device ``lax.scan``.

Parity with reference ``network/diffusion/gaussian_diffusion.py`` (the
standalone ``DiffusionModel``): linear β schedule (:79-80), pred_noise /
pred_x0 / pred_v objectives (:111-152), DDIM with the linspace(-1, T-1, S+1)
time grid and η-σ formula (:155-190), DDPM update (:192-215). Design fix noted
in SURVEY §2.4: the reference stores schedule buffers as plain attributes
(breaks ``.to(device)``); here they're a pytree (``GaussianSchedule``) passed
explicitly, so they live wherever jit puts them.

The reference's reverse loops are host-side Python (hot loop ① of SURVEY §3);
here both samplers are single compiled ``lax.scan`` programs — 1000 U-Net
calls with zero host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import get_betas

ModelFn = Callable[[jax.Array, Optional[jax.Array], jax.Array], jax.Array]
# model_fn(x_t, condition_or_self_cond, t) -> prediction


class GaussianSchedule(NamedTuple):
    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(timesteps: int, name: str = "linear", beta_start: float = 1e-4,
                  beta_end: float = 0.02) -> GaussianSchedule:
    if name == "linear":
        betas = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)
    else:
        betas = get_betas(name, timesteps)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate(([1.0], ac[:-1]))
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return GaussianSchedule(
        betas=f32(betas), alphas=f32(alphas), alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1 - ac)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1 / ac - 1)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(np.log(np.clip(post_var, 1e-20, None))),
        posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
    )


def q_posterior(sched: GaussianSchedule, x0, x_t, t):
    """q(x_{t-1} | x_t, x_0) → (mean, variance, log_variance_clipped)."""
    mean = (_extract(sched.posterior_mean_coef1, t, x_t.ndim) * x0 +
            _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t)
    var = _extract(sched.posterior_variance, t, x_t.ndim)
    logvar = _extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, logvar


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-batch schedule values and reshape for broadcasting."""
    out = arr[t]
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


def q_sample(sched: GaussianSchedule, x0: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward diffusion x0 → x_t (reference add_noise, :85-89)."""
    return (_extract(sched.sqrt_alphas_cumprod, t, x0.ndim) * x0 +
            _extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise)


def predict_start_from_noise(sched, x_t, t, noise):
    return (_extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t -
            _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)


def predict_noise_from_start(sched, x_t, t, x0):
    return ((_extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0) /
            _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))


def predict_v(sched, x0, t, noise):
    return (_extract(sched.sqrt_alphas_cumprod, t, x0.ndim) * noise -
            _extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * x0)


def predict_start_from_v(sched, x_t, t, v):
    return (_extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t -
            _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v)


def model_predictions(sched: GaussianSchedule, model_fn: ModelFn, x_t, condition,
                      t, objective: str = "pred_noise", clip_x_start: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """→ (pred_noise, pred_x0) per the configured objective (:111-152)."""
    out = model_fn(x_t, condition, t)
    clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
    if objective == "pred_noise":
        pred_noise = out
        x0 = clip(predict_start_from_noise(sched, x_t, t, pred_noise))
    elif objective == "pred_x0":
        x0 = clip(out)
        pred_noise = predict_noise_from_start(sched, x_t, t, x0)
    elif objective == "pred_v":
        x0 = clip(predict_start_from_v(sched, x_t, t, out))
        pred_noise = predict_noise_from_start(sched, x_t, t, x0)
    else:
        raise ValueError(objective)
    return pred_noise, x0


def diffusion_loss(sched: GaussianSchedule, model_fn: ModelFn, x0, condition,
                   t, noise, objective: str = "pred_noise") -> Tuple[jax.Array, jax.Array]:
    """MSE training loss (reference forward, :154-168). Returns (loss, x_t)."""
    x_t = q_sample(sched, x0, t, noise)
    out = model_fn(x_t, condition, t)
    if objective == "pred_noise":
        target = noise
    elif objective == "pred_x0":
        target = x0
    elif objective == "pred_v":
        target = predict_v(sched, x0, t, noise)
    else:
        raise ValueError(objective)
    loss = jnp.mean((out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return loss, x_t


def ddpm_sample(sched: GaussianSchedule, model_fn: ModelFn, rng: jax.Array,
                x_t: jax.Array, condition=None, objective: str = "pred_noise",
                clip_x_start: bool = False,
                return_all: bool = False) -> jax.Array:
    """Full reverse DDPM chain as one scan (reference ddpm_sample, :192-215)."""
    T = sched.num_timesteps

    def body(carry, t):
        x, rng = carry
        rng, sub = jax.random.split(rng)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        pred_noise, _ = model_predictions(sched, model_fn, x, condition, tb,
                                          objective, clip_x_start)
        alpha_t = sched.alphas[t]
        hat_alpha_t = sched.alphas_cumprod[t]
        beta_t = sched.betas[t]
        sigma_t = jnp.where(t > 0, jnp.sqrt(beta_t), 0.0)
        z = jnp.where(t > 0, jax.random.normal(sub, x.shape, x.dtype), 0.0)
        x = (1.0 / jnp.sqrt(alpha_t)) * (
            x - (1 - alpha_t) / jnp.sqrt(1 - hat_alpha_t) * pred_noise) + sigma_t * z
        return (x, rng), x if return_all else None

    (x, _), xs = jax.lax.scan(body, (x_t, rng), jnp.arange(T - 1, -1, -1))
    return (x, xs) if return_all else x


def ddim_times(total_timesteps: int, sampling_timesteps: int) -> np.ndarray:
    """torch.linspace(-1, T-1, S+1).int() reversed (reference :172-175)."""
    times = np.linspace(-1, total_timesteps - 1, sampling_timesteps + 1)
    return np.asarray(list(reversed(times.astype(int).tolist())), np.int32)


def ddim_sample(sched: GaussianSchedule, model_fn: ModelFn, rng: jax.Array,
                x_t: jax.Array, condition=None, eta: float = 0.0,
                sampling_timesteps: Optional[int] = None,
                objective: str = "pred_noise", clip_x_start: bool = False,
                return_all: bool = False) -> jax.Array:
    """DDIM reverse chain as one scan (reference ddim_sample, :155-190)."""
    T = sched.num_timesteps
    S = sampling_timesteps or T
    times = ddim_times(T, S)
    pairs = jnp.stack([jnp.asarray(times[:-1]), jnp.asarray(times[1:])], axis=1)

    def body(carry, pair):
        x, rng = carry
        time, time_next = pair[0], pair[1]
        rng, sub = jax.random.split(rng)
        tb = jnp.full((x.shape[0],), time, jnp.int32)
        pred_noise, x_start = model_predictions(sched, model_fn, x, condition, tb,
                                                objective, clip_x_start)
        at = sched.alphas_cumprod[time]
        at1 = sched.alphas_cumprod[jnp.maximum(time_next, 0)]
        sigma = eta * jnp.sqrt((1 - at / at1) * (1 - at1) / (1 - at))
        c = jnp.sqrt(jnp.maximum(1 - at1 - sigma ** 2, 0.0))
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x_upd = x_start * jnp.sqrt(at1) + c * pred_noise + sigma * noise
        x = jnp.where(time_next < 0, x_start, x_upd)
        return (x, rng), x if return_all else None

    (x, _), xs = jax.lax.scan(body, (x_t, rng), pairs)
    return (x, xs) if return_all else x
