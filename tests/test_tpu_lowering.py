"""Device-free TPU lowering regression tests (small shapes).

``trace().lower(lowering_platforms=("tpu",))`` runs the Pallas→Mosaic
dialect conversion without hardware — the launch-blocking error class
(misaligned block shapes, unsupported casts) that interpret-mode tests
cannot catch. Full sweep at bench shapes: ``tools/check_tpu_lowering.py``.
"""

import jax
import jax.numpy as jnp
import pytest


def _lowers(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("prng", [False, True])
@pytest.mark.parametrize("trunc_k", [0, 40])
def test_posterior_kernels_lower_for_tpu(prng, trunc_k):
    from vq_vae_gan_diffusion_tpu.diffusion.discrete import DiscreteDiffusion
    from vq_vae_gan_diffusion_tpu.ops.discrete_posterior_pallas import (
        fused_posterior_sample, fused_posterior_sample_prng,
        gather_posterior_coefs)

    b, n, k, T = 3, 49, 257, 10
    d = DiscreteDiffusion(num_classes=k, seq_len=n, timesteps=T)
    logits = jnp.zeros((b, n, k - 1), jnp.float32)
    x_t = jnp.zeros((b, n), jnp.int32)
    coefs = gather_posterior_coefs(d.sched, jnp.full((b,), 3, jnp.int32), T)
    if prng:
        seeds = jnp.zeros((b, 2), jnp.int32)
        _lowers(lambda *a: fused_posterior_sample_prng(*a, trunc_k=trunc_k),
                logits, x_t, coefs, seeds)
    else:
        gumbel = jnp.zeros((b, n, k), jnp.float32)
        _lowers(lambda *a: fused_posterior_sample(*a, trunc_k=trunc_k),
                logits, x_t, coefs, gumbel)


@pytest.mark.parametrize("mode", ["pallas", "packed"])
def test_shuffle_fused_modes_lower_for_tpu(mode):
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    unet = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                       out_channels=1, base_dim=16, dim_mults=(1, 2))
    x = jnp.zeros((2, 32, 16, 1), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.int32)
    variables = unet.init(jax.random.PRNGKey(0), x.astype(jnp.float32),
                          None, t, train=False)
    folded = fold_unet(variables, dtype=jnp.bfloat16)
    _lowers(lambda xx, tt: apply_folded(folded, xx, tt, use_pallas=mode),
            x, t)


def test_gpt_decode_kernel_lowers_for_tpu():
    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT, sample_tokens

    gpt = GPT(vocab_size=128, block_size=64, n_layer=2, n_head=2,
              n_embd=128, dtype=jnp.bfloat16)
    params = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2), jnp.int32))["params"]
    prefix = jnp.zeros((2, 1), jnp.int32)
    for quant in (None, "int8kv", "int4"):
        _lowers(lambda p, r, x: sample_tokens(gpt, p, r, x, prefix_len=1,
                                              steps=4, fused=True,
                                              quant=quant),
                params, jax.random.PRNGKey(0), prefix)
