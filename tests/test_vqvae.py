"""VQVAE / VAE / codebook unit tests (mirror reference __main__ smoke tests:
vqvae.py:217-248, vae.py:85-111, encoder.py:103-116, decoder.py:106-121)."""

import jax
import jax.numpy as jnp
import numpy as np

from vq_vae_gan_diffusion_tpu.models import (VAE, VQVAE, Decoder, Encoder,
                                             nearest_codebook_indices, quantize)


def test_encoder_decoder_roundtrip_shapes(rng):
    enc = Encoder(image_size=32, latent_channels=32,
                  intermediate_channels=(16, 32, 32), num_residual_blocks=1,
                  attention_resolution=(8,))
    x = jax.random.normal(rng, (2, 32, 32, 3))
    ep = enc.init(rng, x)
    z = enc.apply(ep, x)
    assert z.shape == (2, 8, 8, 32)  # two downsamples: 32→16→8

    dec = Decoder(img_channels=3, latent_size=8,
                  intermediate_channels=(16, 32, 32), num_residual_blocks=1,
                  attention_resolution=(8,))
    dp = dec.init(rng, z)
    y = dec.apply(dp, z)
    assert y.shape == (2, 32, 32, 3)


def test_nearest_codebook_indices_exact(rng):
    z = jax.random.normal(rng, (64, 16))
    cb = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    idx = nearest_codebook_indices(z, cb)
    # brute-force reference
    d = np.linalg.norm(np.asarray(z)[:, None, :] - np.asarray(cb)[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))


def test_quantize_straight_through(rng):
    """d z_q / d z must be identity (straight-through, codebook.py:106)."""
    z = jax.random.normal(rng, (1, 2, 2, 8))
    cb = jax.random.normal(jax.random.PRNGKey(1), (16, 8))

    def f(z):
        z_q, _, _ = quantize(z, cb)
        return jnp.sum(z_q * 3.0)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), 3.0, rtol=1e-6)


def test_quantize_loss_semantics(rng):
    """loss = mean((sg(zq)-z)²) + β·mean((zq-sg(z))²); grads split encoder vs codebook."""
    z = jax.random.normal(rng, (1, 2, 2, 8))
    cb = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    beta = 0.25

    def loss_fn(z, cb):
        _, _, loss = quantize(z, cb, beta)
        return loss

    loss = loss_fn(z, cb)
    zq = np.take(np.asarray(cb), np.asarray(nearest_codebook_indices(z.reshape(-1, 8), cb)), axis=0)
    expected = np.mean((zq - np.asarray(z).reshape(-1, 8)) ** 2) * (1 + beta)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    gz, gcb = jax.grad(loss_fn, argnums=(0, 1))(z, cb)
    assert np.abs(np.asarray(gz)).max() > 0  # commitment trains encoder
    assert np.abs(np.asarray(gcb)).max() > 0  # β term trains codebook


def test_vqvae_forward(tiny_config, rng):
    model = VQVAE.from_config(tiny_config)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    params = model.init(rng, x)
    decoded, indices, q_loss = model.apply(params, x)
    assert decoded.shape == (2, 32, 32, 3)
    assert indices.shape == (2, 8, 8)
    assert indices.dtype == jnp.int32
    assert np.isfinite(float(q_loss))
    assert int(indices.max()) < 64


def test_vqvae_decode_indices(tiny_config, rng):
    model = VQVAE.from_config(tiny_config)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    params = model.init(rng, x)
    idx = jax.random.randint(rng, (2, 64), 0, 64)
    imgs = model.apply(params, idx, method=VQVAE.decode_indices)
    assert imgs.shape == (2, 32, 32, 3)


def test_vae_forward(tiny_config, rng):
    model = VAE.from_config(tiny_config)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    params = model.init(rng, x, rng)
    decoded, mu, logvar = model.apply(params, x, rng)
    assert decoded.shape == (2, 32, 32, 3)
    assert mu.shape == (2, 8, 8, 32)
    assert logvar.shape == (2, 8, 8, 32)


def test_vqvae_jit_and_grad(tiny_config, rng):
    """Whole VQVAE forward+backward under jit — the stage-1 train-step core."""
    model = VQVAE.from_config(tiny_config)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    params = model.init(rng, x)

    @jax.jit
    def loss_fn(params, x):
        decoded, _, q_loss = model.apply(params, x)
        return jnp.mean(jnp.abs(decoded - x)) + q_loss

    g = jax.grad(loss_fn)(params, x)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    # codebook must receive gradient through the β term
    cbg = g["params"]["codebook"]["embedding"]
    assert np.abs(np.asarray(cbg)).max() > 0
