"""Diffusion core tests: schedule golden values vs the reference's closed
forms, q_sample/posterior identities, sampler shapes, discrete log-space
consistency (SURVEY §4 plan items b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.diffusion import (DiscreteDiffusion, LtState,
                                                cosine_betas,
                                                discrete_alpha_schedule,
                                                index_to_log_onehot,
                                                linear_betas,
                                                log_onehot_to_index,
                                                make_schedule, q_sample)
from vq_vae_gan_diffusion_tpu.diffusion.gaussian import (ddim_sample,
                                                         ddpm_sample,
                                                         diffusion_loss)


def test_linear_betas_golden():
    b = linear_betas(1000)
    assert b[0] == pytest.approx(1e-4)
    assert b[-1] == pytest.approx(0.02)
    assert len(b) == 1000


def test_cosine_betas_properties():
    b = cosine_betas(1000)
    assert (b > 0).all() and (b <= 0.999).all()
    # cosine alphas_cumprod at t=0 should be close to 1
    ac = np.cumprod(1 - b)
    assert ac[0] > 0.99
    assert ac[-1] < 1e-3


def test_discrete_alpha_schedule_is_distribution():
    at, bt, ct, att, btt, ctt = discrete_alpha_schedule(100, N=1023)
    # keep + N·uniform + mask must sum to 1 at every step
    np.testing.assert_allclose(at + 1023 * bt + ct, 1.0, atol=1e-9)
    np.testing.assert_allclose(att + 1023 * btt + ctt, 1.0, atol=1e-9)
    assert att[-1] == pytest.approx(1.0)  # reference's trailing pad
    assert ctt[-1] == pytest.approx(0.0)


def test_q_sample_terminal_snr():
    sched = make_schedule(1000, "linear")
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    t0 = jnp.zeros((2,), jnp.int32)
    xt = q_sample(sched, x0, t0, noise)
    np.testing.assert_allclose(np.asarray(xt), np.sqrt(1 - 1e-4), rtol=1e-5)


def _dummy_model(x, cond, t):
    return 0.1 * x


def test_ddpm_ddim_shapes(rng):
    sched = make_schedule(8, "linear")
    x = jax.random.normal(rng, (2, 8, 8, 1))
    out = ddpm_sample(sched, _dummy_model, rng, x)
    assert out.shape == x.shape
    out2 = ddim_sample(sched, _dummy_model, rng, x, sampling_timesteps=4)
    assert out2.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(out2)).all()


def test_diffusion_loss_objectives(rng):
    sched = make_schedule(8, "linear")
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    t = jnp.array([1, 5])
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    for obj in ("pred_noise", "pred_x0", "pred_v"):
        loss, xt = diffusion_loss(sched, _dummy_model, x0, None, t, noise, obj)
        assert np.isfinite(float(loss))
        assert xt.shape == x0.shape


# -- discrete ---------------------------------------------------------------

K, N, T = 16, 8, 6


def _disc_model(log_x_t, t):
    # deterministic pseudo-logits from the input
    return jnp.cumsum(log_x_t, axis=-1)[..., : K - 1] * 0.01


@pytest.fixture(scope="module")
def disc():
    d = DiscreteDiffusion(num_classes=K, seq_len=N, timesteps=T)
    d.model_fn = _disc_model
    return d


def test_log_onehot_roundtrip():
    x = jnp.array([[0, 3, 15, 7]])
    log_x = index_to_log_onehot(x, K)
    np.testing.assert_array_equal(np.asarray(log_onehot_to_index(log_x)),
                                  np.asarray(x))


def test_q_pred_is_distribution(disc):
    x = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]])
    log_x = index_to_log_onehot(x, K)
    for t_val in (0, 3, T - 1):
        t = jnp.array([t_val])
        probs = np.exp(np.asarray(disc.q_pred(log_x, t)))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
        probs1 = np.exp(np.asarray(disc.q_pred_one_timestep(log_x, t)))
        np.testing.assert_allclose(probs1.sum(-1), 1.0, atol=1e-4)


def test_q_posterior_is_distribution(disc, rng):
    x0 = jax.random.randint(rng, (2, N), 0, K - 1)
    log_x0 = index_to_log_onehot(x0, K)
    t = jnp.array([2, 4])
    log_xt = disc.q_sample(rng, log_x0, t)
    post = disc.q_posterior(log_x0, log_xt, t)
    probs = np.exp(np.asarray(post))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=2e-3)


def test_q_posterior_idx_matches_dense(disc, rng):
    """Structured one-hot posterior ≡ dense q_posterior on one-hot x_t."""
    r1, r2, r3 = jax.random.split(rng, 3)
    # x_t with a mix of ordinary and [MASK] tokens
    x_t = jax.random.randint(r1, (3, N), 0, K)
    log_xt = index_to_log_onehot(x_t, K)
    # dense log_x_start as a model-style clamped log-softmax
    logits = jax.random.normal(r2, (3, N, K - 1))
    log_x0 = jnp.clip(jnp.concatenate(
        [jax.nn.log_softmax(logits, -1),
         jnp.full((3, N, 1), -70.0)], -1), -70.0, 0.0)
    for t_val in ([0, 1, T - 1], [2, 3, 4]):
        t = jnp.array(t_val)
        dense = np.asarray(disc.q_posterior(log_x0, log_xt, t))
        fast = np.asarray(disc.q_posterior_idx(log_x0, x_t, t))
        np.testing.assert_allclose(fast, dense, atol=1e-5, rtol=1e-5)
    # also with a one-hot log_x_start (the train-loss log_true_prob call)
    x0 = jax.random.randint(r3, (3, N), 0, K - 1)
    log_x0_oh = index_to_log_onehot(x0, K)
    t = jnp.array([1, 2, T - 1])
    dense = np.asarray(disc.q_posterior(log_x0_oh, log_xt, t))
    fast = np.asarray(disc.q_posterior_idx(log_x0_oh, x_t, t))
    np.testing.assert_allclose(fast, dense, atol=1e-5, rtol=1e-5)


def test_sample_idx_carry_matches_dense_chain(disc, rng):
    """The index-carry sampler reproduces the dense-chain trajectory
    token-for-token (same rng stream; logits agree to ~1e-21)."""

    def sample_dense(rng, batch_size):
        rng_init, rng_loop = jax.random.split(rng)
        log_z = disc._chain_init(rng_init, batch_size)
        def body(carry, i):
            log_z, r = carry
            r, sub = jax.random.split(r)
            t = jnp.full((batch_size,), i, jnp.int32)
            log_z = disc.log_sample_categorical(sub, disc.p_pred(log_z, t))
            return (log_z, r), None
        (log_z, _), _ = jax.lax.scan(
            body, (log_z, rng_loop),
            jnp.arange(disc.sampling_timesteps - 1, -1, -1))
        return log_onehot_to_index(log_z)

    ref = np.asarray(sample_dense(rng, 2))
    got = np.asarray(disc.sample(rng, batch_size=2))
    np.testing.assert_array_equal(got, ref)
    # filmstrip variant: same final tokens, one frame per reverse step
    got2, frames = disc.sample(rng, batch_size=2, return_all_timesteps=True)
    np.testing.assert_array_equal(np.asarray(got2), ref)
    assert frames.shape == (2, disc.sampling_timesteps, N)
    np.testing.assert_array_equal(np.asarray(frames[:, -1]), ref)


def test_gaussian2d_self_condition_loss(rng):
    """self_condition training branch: lax.cond runs the extra denoiser
    forward only on the coin-flip steps; loss finite, grads flow, and the
    value equals the always-compute jnp.where formulation."""
    from vq_vae_gan_diffusion_tpu.diffusion.gaussian2d import (
        GaussianDiffusion2D, GaussianDiffusion2DConfig)

    cfg = GaussianDiffusion2DConfig(seq_length=8, timesteps=6,
                                    sampling_timesteps=6, vocab_size=16,
                                    gaussian_dim=4, diffusion_type=
                                    "gaussiandiffusion2d",
                                    self_condition=True)
    W = jax.random.normal(rng, (4, 4))

    def loss_of(w, key):
        proc = GaussianDiffusion2D(cfg, model_fn=lambda x, sc, t:
                                   jnp.einsum("bcn,cd->bdn", x, w) +
                                   (0.0 if sc is None else 0.1 * sc))
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
        return proc.loss(x0, key)

    for seed in (0, 1, 2, 3):  # hit both sides of the coin
        key = jax.random.PRNGKey(seed)
        val, grad = jax.value_and_grad(loss_of)(W, key)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()


def test_discrete_train_loss_and_state(disc, rng):
    x0 = jax.random.randint(rng, (2, N), 0, K - 1)
    lt = LtState.init(T)
    loss, metrics, new_lt = disc.train_loss(rng, x0, lt)
    assert np.isfinite(float(loss))
    assert float(jnp.sum(new_lt.Lt_count)) == 2.0  # one count per sample
    assert np.isfinite(np.asarray(new_lt.Lt_history)).all()


def test_discrete_sample_shapes(disc, rng):
    idx = disc.sample(rng, batch_size=2)
    assert idx.shape == (2, N)
    assert int(idx.max()) < K
    idx_fast = disc.sample_fast(rng, batch_size=2, skip_step=2)
    assert idx_fast.shape == (2, N)


def test_discrete_loss_grad_flows(rng):
    """Gradient must flow through predict_start into model params."""
    import flax.linen as fnn

    class TinyModel(fnn.Module):
        @fnn.compact
        def __call__(self, log_x, t):
            return fnn.Dense(K - 1)(log_x)

    m = TinyModel()
    x0 = jax.random.randint(rng, (2, N), 0, K - 1)
    params = m.init(rng, index_to_log_onehot(x0, K), jnp.zeros((2,), jnp.int32))

    d = DiscreteDiffusion(num_classes=K, seq_len=N, timesteps=T)

    def loss_fn(params):
        d.model_fn = lambda lx, t: m.apply(params, lx, t)
        loss, _, _ = d.train_loss(jax.random.PRNGKey(3), x0, LtState.init(T))
        return loss

    g = jax.grad(loss_fn)(params)
    gmax = max(float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g))
    assert gmax > 0
