"""Fused ShuffleNet bottleneck kernel + BN-folded inference forward.

Verifies ops/shuffle_pallas.py (interpret mode on CPU) and
models/shuffle_infer.py against the flax module in inference mode — the
sampling-chain fast path (2.1× measured on v5e, BENCHMARKS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.models.unet_shuffle import (ResidualBottleneck,
                                                          ShuffleUNet)
from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                           fold_unet)
from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
    fold_bottleneck_params, fused_bottleneck, reference_bottleneck)


def _nontrivial(variables, rng_scale=0.05):
    """Give batch stats / params non-default values so BN folding is tested."""
    return jax.tree_util.tree_map(
        lambda v: v + rng_scale * jnp.arange(v.size).reshape(v.shape) / max(v.size, 1),
        variables)


@pytest.fixture(scope="module")
def unit():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 12, 16), jnp.float32)
    mod = ResidualBottleneck(16)
    variables = _nontrivial(mod.init(rng, x, train=False))
    ref = mod.apply(variables, x, train=False)
    folded = fold_bottleneck_params(variables["params"], variables["batch_stats"])
    return x, ref, folded


def test_folded_spec_matches_flax(unit):
    x, ref, folded = unit
    out = reference_bottleneck(x, folded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_interpret_matches_flax(unit):
    x, ref, folded = unit
    out = fused_bottleneck(x, folded, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_interpret_multi_tile():
    """H > tile size exercises the halo-row path across tile boundaries."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 64, 8, 8), jnp.float32)
    mod = ResidualBottleneck(8)
    variables = _nontrivial(mod.init(rng, x, train=False))
    ref = mod.apply(variables, x, train=False)
    folded = fold_bottleneck_params(variables["params"], variables["batch_stats"])
    out = fused_bottleneck(x, folded, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_full_unet_folded_inference():
    rng = jax.random.PRNGKey(2)
    unet = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                       out_channels=1, base_dim=16, dim_mults=(1, 2))
    x = jax.random.normal(rng, (2, 32, 16, 1), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    variables = _nontrivial(unet.init(rng, x, None, t, train=False))
    ref = unet.apply(variables, x, None, t, train=False)
    folded = fold_unet(variables, dtype=jnp.float32)
    for mode in (False, "interpret"):
        out = apply_folded(folded, x, t, use_pallas=mode, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_composite_fused_sampler_matches_module(tiny_config, rng):
    """The gaussiandiffusion3d sampling path with fused_sampler on/off draws
    the same chain (same rng ⇒ same indices) in f32."""
    from vq_vae_gan_diffusion_tpu.models.vq_diffusion_composite import (
        VQDiffusionComposite)

    cfg = tiny_config.replace_path("architecture.model_name", "vqdiffusion")
    comp = VQDiffusionComposite(cfg)
    uvars = comp.unet.init(rng, jnp.zeros((1, comp.seq_len, comp.gaussian_dim, 1)),
                           None, jnp.zeros((1,), jnp.int32), train=False)
    uvars = _nontrivial(uvars)
    params, stats = uvars["params"], uvars.get("batch_stats", {})

    comp.fused_sampler = True
    a = comp.sample(params, stats, jax.random.PRNGKey(3), 2)
    comp.fused_sampler = False
    b = comp.sample(params, stats, jax.random.PRNGKey(3), 2)
    assert a.shape == b.shape
    # discrete indices after the argmin decode: demand near-total agreement
    agree = float(jnp.mean((a == b).astype(jnp.float32)))
    assert agree > 0.99, f"fused sampler diverged: agreement {agree}"
    # the batch-packed kernel chain draws the same indices too
    comp.fused_sampler = "packed_interpret"
    c = comp.sample(params, stats, jax.random.PRNGKey(3), 2)
    agree = float(jnp.mean((b == c).astype(jnp.float32)))
    assert agree > 0.99, f"packed sampler diverged: agreement {agree}"
