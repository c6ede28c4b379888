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


@pytest.mark.parametrize("b,n,k,T,r", [(2, 16, 1025, 10, 0.86),
                                       (2, 49, 257, 8, 0.5)])
def test_fused_truncated_step_matches_xla(b, n, k, T, r):
    """In-kernel radix-select top-r threshold ≡ jax.lax.top_k masking."""
    d = DiscreteDiffusion(num_classes=k, seq_len=n, timesteps=T,
                          truncation_rate=r)
    r1, r2, r3 = jax.random.split(jax.random.PRNGKey(5), 3)
    logits = jax.random.normal(r1, (b, n, k - 1)) * 3.0
    x_t = jax.random.randint(r2, (b, n), 0, k)
    u = jax.random.uniform(r3, (b, n, k))
    gumbel = -jnp.log(-jnp.log(u + 1e-30) + 1e-30)
    trunc_k = max(int(k * r), 1)
    for t_val in (0, T - 1):
        t = jnp.full((b,), t_val, jnp.int32)
        coefs = gather_posterior_coefs(d.sched, t, d.num_timesteps)
        got = fused_posterior_sample(logits, x_t, coefs, gumbel,
                                     interpret=True, trunc_k=trunc_k)
        # XLA reference: posterior → top-k mask → gumbel argmax
        ev = d.q_posterior_idx(d._log_pred_from_logits(logits), x_t, t)
        kth = jax.lax.top_k(ev, trunc_k)[0][..., -1:]
        masked = jnp.where(ev < kth, -jnp.inf, ev)
        ref = jnp.argmax(gumbel + masked, axis=-1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_fast_sample_truncated_token_parity():
    """End-to-end transformer-style truncated chain, fused vs XLA."""
    K, N, T = 129, 16, 6
    d = DiscreteDiffusion(num_classes=K, seq_len=N, timesteps=T,
                          truncation_rate=0.7, chain_init="prior")
    W = jax.random.normal(jax.random.PRNGKey(2), (K, K - 1))
    d.model_fn_idx = lambda idx, t: W[idx] * 0.5
    d.model_fn = lambda log_x, t: d.model_fn_idx(jnp.argmax(log_x, -1), t)

    def chain(fused):
        d.fused_posterior = "interpret" if fused else False
        rng = jax.random.PRNGKey(11)
        z = jnp.zeros((2, N), jnp.int32)
        for i in range(T - 1, -1, -1):
            rng, sub = jax.random.split(rng)
            t = jnp.full((2,), i, jnp.int32)
            z = d._step_idx(sub, z, t, t, truncated=True)
        d.fused_posterior = False
        return np.asarray(z)

    np.testing.assert_array_equal(chain(True), chain(False))


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

# ---- in-kernel PRNG gumbel variant -----------------------------------------

def test_gumbel_from_bits_transform():
    """bits → gumbel transform: matches a float64 reference on the same
    uniforms and has Gumbel(0,1) moments (mean γ ≈ 0.5772, var π²/6)."""
    from vq_vae_gan_diffusion_tpu.ops.discrete_posterior_pallas import (
        _gumbel_from_bits)
    bits = np.random.default_rng(0).integers(0, 2 ** 32, size=(200_000,),
                                             dtype=np.uint64).astype(np.uint32)
    got = np.asarray(_gumbel_from_bits(jnp.asarray(bits)))
    u64 = (bits >> np.uint32(8)).astype(np.float64) / (1 << 24)
    ref = -np.log(-np.log(u64 + 1e-30) + 1e-30)
    # TPU log/exp are a few ULP off the host libm (measured ≤3.7e-4 abs on
    # 200k samples). rtol must stay ~1e-3 so a percent-level multiplicative
    # bug in the transform cannot hide inside the tolerance (advisor r2);
    # atol=5e-4 covers the measured ULP drift, and the moment checks below
    # remain the distributional backstop.
    tol = dict(rtol=2e-5, atol=2e-5) if _on_tpu() is False else \
        dict(rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(got, ref.astype(np.float32), **tol)
    assert abs(got.mean() - 0.5772) < 0.02
    assert abs(got.var() - np.pi ** 2 / 6) < 0.05


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@pytest.mark.skipif(not _on_tpu(), reason="pltpu.prng_* has no CPU lowering")
def test_prng_kernel_on_tpu():
    """TPU-only: determinism per seed, validity, truncated-support
    confinement, and distribution agreement with the XLA sampler."""
    from vq_vae_gan_diffusion_tpu.ops.discrete_posterior_pallas import (
        fused_posterior_sample_prng)
    b, n, k, T = 4, 256, 257, 10
    d = DiscreteDiffusion(num_classes=k, seq_len=n, timesteps=T)
    r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 3)
    logits = jax.random.normal(r1, (b, n, k - 1)) * 2.0
    # identical rows → empirical token histogram estimates the posterior
    logits = jnp.broadcast_to(logits[:, :1], logits.shape)
    x_t = jnp.broadcast_to(jax.random.randint(r2, (b, 1), 0, k), (b, n))
    t = jnp.full((b,), T // 2, jnp.int32)
    coefs = gather_posterior_coefs(d.sched, t, d.num_timesteps)
    seeds = jax.random.bits(r3, (b, 2), jnp.uint32)

    got = np.asarray(fused_posterior_sample_prng(logits, x_t, coefs, seeds))
    again = np.asarray(fused_posterior_sample_prng(logits, x_t, coefs, seeds))
    np.testing.assert_array_equal(got, again)          # deterministic
    other = np.asarray(fused_posterior_sample_prng(logits, x_t, coefs,
                                                   seeds + 1))
    assert (got != other).any()                        # stream moves
    assert got.min() >= 0 and got.max() < k

    # distribution: TV distance between empirical histogram and the exact
    # posterior over all b*n iid draws (rows identical per batch)
    ev = d.q_posterior_idx(d._log_pred_from_logits(logits), x_t, t)
    p = np.asarray(jnp.exp(ev))[:, 0]                  # [b, k]
    for bi in range(b):
        hist = np.bincount(got[bi], minlength=k) / n
        tv = 0.5 * np.abs(hist - p[bi]).sum()
        assert tv < 0.35, tv                           # n=256 draws

    # truncated: samples confined to the top-k support
    trunc_k = 16
    gt = np.asarray(fused_posterior_sample_prng(logits, x_t, coefs, seeds,
                                                trunc_k=trunc_k))
    kth = np.asarray(jax.lax.top_k(ev, trunc_k)[0][..., -1])
    evn = np.asarray(ev)
    for bi in range(b):
        for j in range(n):
            assert evn[bi, j, gt[bi, j]] >= kth[bi, j]
