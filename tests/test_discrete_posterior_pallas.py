"""Interpret-mode parity for the fused discrete-posterior sampler kernel.

The kernel must be token-identical to the XLA path: same gumbel noise in →
same indices out (ops/discrete_posterior_pallas.py docstring). Covers
lane-aligned (K−1 = 1024) and odd (K−1 = 256 with N = 49, the mnist grid)
shapes, carries mixing [MASK] and ordinary tokens, and the end-to-end
sampler with ``fused_posterior = 'interpret'``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.diffusion.discrete import (DiscreteDiffusion,
                                                         index_to_log_onehot)
from vq_vae_gan_diffusion_tpu.ops.discrete_posterior_pallas import (
    fused_posterior_sample, gather_posterior_coefs)


def _xla_step(d, logits, x_t, t_post, gumbel):
    log_x0 = d._log_pred_from_logits(logits)
    ev = d.q_posterior_idx(log_x0, x_t, t_post)
    return jnp.argmax(gumbel + ev, axis=-1)


@pytest.mark.parametrize("b,n,k,T", [(3, 16, 1025, 12), (2, 49, 257, 8)])
def test_fused_step_matches_xla(b, n, k, T):
    d = DiscreteDiffusion(num_classes=k, seq_len=n, timesteps=T)
    r1, r2, r3, r4 = jax.random.split(jax.random.PRNGKey(0), 4)
    logits = jax.random.normal(r1, (b, n, k - 1)) * 3.0
    x_t = jax.random.randint(r2, (b, n), 0, k)      # incl. [MASK] = k-1
    u = jax.random.uniform(r3, (b, n, k))
    gumbel = -jnp.log(-jnp.log(u + 1e-30) + 1e-30)
    for t_val in (0, 1, T - 1):
        t_post = jax.random.randint(r4, (b,), 0, T) * 0 + t_val
        coefs = gather_posterior_coefs(d.sched, t_post, d.num_timesteps)
        got = fused_posterior_sample(logits, x_t, coefs, gumbel,
                                     interpret=True)
        ref = _xla_step(d, logits, x_t, t_post, gumbel)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_sampler_end_to_end_token_parity():
    K, N, T = 129, 16, 6
    d = DiscreteDiffusion(num_classes=K, seq_len=N, timesteps=T)
    d.model_fn = lambda log_x, t: jnp.cumsum(log_x, -1)[..., : K - 1] * 0.01

    rng = jax.random.PRNGKey(7)
    base = np.asarray(d.sample(rng, batch_size=2))
    base_fast = np.asarray(d.sample_fast(rng, batch_size=2, skip_step=2))

    d.fused_posterior = "interpret"
    np.testing.assert_array_equal(np.asarray(d.sample(rng, batch_size=2)),
                                  base)
    np.testing.assert_array_equal(
        np.asarray(d.sample_fast(rng, batch_size=2, skip_step=2)), base_fast)


def test_fused_sampler_with_index_native_model():
    """model_fn_idx binding (TransformerPredictor-style) + fused kernel."""
    K, N, T = 65, 8, 5
    d = DiscreteDiffusion(num_classes=K, seq_len=N, timesteps=T)
    W = jax.random.normal(jax.random.PRNGKey(1), (K, K - 1))
    d.model_fn_idx = lambda idx, t: W[idx] + t[:, None, None].astype(jnp.float32)
    d.model_fn = lambda log_x, t: d.model_fn_idx(jnp.argmax(log_x, -1), t)

    rng = jax.random.PRNGKey(3)
    base = np.asarray(d.sample(rng, batch_size=2))
    d.fused_posterior = "interpret"
    np.testing.assert_array_equal(np.asarray(d.sample(rng, batch_size=2)),
                                  base)
