"""Batch-packed ShuffleNet bottleneck kernel (ops/shuffle_pallas.py v2).

Interpret-mode (CPU) parity of the packed whole-unit kernel — lanes pack
G images, the channel shuffle is folded into the final pointwise weights —
against the flax ResidualBottleneck and the v1 spec:
- single unit, several (shape, G) combos incl. rectangular cin != cout;
- chained units (the shuffled halves feed the next unit with no layout ops);
- pack/unpack round trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ResidualBottleneck
from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
    fold_bottleneck_params, fold_bottleneck_params_packed,
    fused_bottleneck_packed, pack_images, packed_bottleneck_chain,
    pick_group, unpack_images)


def _nontrivial(variables, scale=0.05):
    return jax.tree_util.tree_map(
        lambda v: v + scale * jnp.arange(v.size).reshape(v.shape)
        / max(v.size, 1), variables)


def _make_unit(rng, x, cout):
    mod = ResidualBottleneck(cout)
    variables = _nontrivial(mod.init(rng, x, train=False))
    ref = mod.apply(variables, x, train=False)
    folded = fold_bottleneck_params(variables["params"],
                                    variables["batch_stats"])
    return ref, folded


def test_pack_unpack_roundtrip():
    x = jnp.arange(4 * 6 * 5 * 8, dtype=jnp.float32).reshape(4, 6, 5, 8)
    for g in (1, 2, 4):
        np.testing.assert_array_equal(
            np.asarray(unpack_images(pack_images(x, g), g)), np.asarray(x))


def test_pick_group():
    assert pick_group(16, 32, 32) == 4
    assert pick_group(16, 64, 64) == 2
    assert pick_group(16, 128, 128) == 1
    assert pick_group(6, 32, 32) == 3       # must divide the batch
    assert pick_group(16, 32, 64) == 2      # output lanes bound it too


@pytest.mark.parametrize("shape,cout,g", [
    ((4, 16, 12, 16), 16, 2),     # square unit, packed
    ((4, 16, 12, 16), 16, 1),     # G=1 degenerate packing
    ((4, 16, 12, 16), 8, 2),      # rectangular: cout < cin
    ((8, 16, 12, 16), 32, 4),     # rectangular: cout > cin
])
def test_packed_kernel_matches_flax(shape, cout, g):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32)
    ref, folded = _make_unit(rng, x, cout)
    ch = shape[-1] // 2
    pp = fold_bottleneck_params_packed(folded, g, dtype=jnp.float32)
    y1, y2 = fused_bottleneck_packed(pack_images(x[..., :ch], g),
                                     pack_images(x[..., ch:], g),
                                     pp, interpret=True)
    out = jnp.concatenate([unpack_images(y1, g), unpack_images(y2, g)], -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_packed_kernel_multi_tile():
    """H big enough for several row tiles — halo rows cross tile borders."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 64, 8, 8), jnp.float32)
    ref, folded = _make_unit(rng, x, 8)
    pp = fold_bottleneck_params_packed(folded, 2, dtype=jnp.float32)
    y1, y2 = fused_bottleneck_packed(pack_images(x[..., :4], 2),
                                     pack_images(x[..., 4:], 2),
                                     pp, interpret=True)
    out = jnp.concatenate([unpack_images(y1, 2), unpack_images(y2, 2)], -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_full_unet_packed_inference():
    """apply_folded(use_pallas='packed_interpret') ≡ the flax module — the
    whole UNet with packed unit chains, XLA downsample/time-mlp/resize."""
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    rng = jax.random.PRNGKey(3)
    unet = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                       out_channels=1, base_dim=16, dim_mults=(1, 2))
    x = jax.random.normal(rng, (4, 32, 16, 1), jnp.float32)
    t = jnp.array([3, 7, 1, 9], jnp.int32)
    variables = _nontrivial(unet.init(rng, x, None, t, train=False))
    ref = unet.apply(variables, x, None, t, train=False)
    folded = fold_unet(variables, dtype=jnp.float32)
    out = apply_folded(folded, x, t, use_pallas="packed_interpret",
                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("shape,cout,g", [
    ((4, 16, 12, 16), 32, 2),     # typical: C -> 2C at half resolution
    ((4, 16, 12, 16), 16, 2),     # C preserved
    ((2, 32, 8, 8), 16, 1),       # G=1, multi-tile rows
])
def test_packed_downsample_matches_flax(shape, cout, g):
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import (
        ResidualDownsample)
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        fold_bottleneck_params_packed, fold_downsample_params,
        fused_downsample_packed)

    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, shape, jnp.float32)
    mod = ResidualDownsample(cout)
    variables = _nontrivial(mod.init(rng, x, train=False))
    ref = mod.apply(variables, x, train=False)
    folded = fold_downsample_params(variables["params"],
                                    variables["batch_stats"])
    pp = fold_bottleneck_params_packed(folded, g, dtype=jnp.float32)
    y1, y2 = fused_downsample_packed(pack_images(x, g), pp, interpret=True)
    out = jnp.concatenate([unpack_images(y1, g), unpack_images(y2, g)], -1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_packed_kernel_bf16():
    """Production dtype: bf16 activations/weights, f32 accumulation —
    matches the flax module to bf16 tolerance."""
    rng = jax.random.PRNGKey(6)
    x = jax.random.normal(rng, (4, 16, 12, 16), jnp.float32)
    ref, folded = _make_unit(rng, x, 16)
    pp = fold_bottleneck_params_packed(folded, 2, dtype=jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    y1, y2 = fused_bottleneck_packed(pack_images(xb[..., :8], 2),
                                     pack_images(xb[..., 8:], 2),
                                     pp, interpret=True)
    out = jnp.concatenate([unpack_images(y1, 2), unpack_images(y2, 2)], -1)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(ref), atol=0.06, rtol=0.05)


def test_packed_chain_matches_flax_chain():
    """3 units chained packed == 3 flax units applied sequentially."""
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (4, 16, 12, 16), jnp.float32)
    cur, units = x, []
    for i in range(3):
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur,
                                 16 if i < 2 else 8)
        units.append(folded)
        cur = ref
    out = packed_bottleneck_chain(x, units, g=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=1e-4)



def test_packed_downsample_time_prologue():
    """TimeMLP silu(x+h) fused as the downsample kernel's prologue ==
    applying it in XLA then the flax ResidualDownsample."""
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import (
        ResidualDownsample)
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import packed_downsample

    rng = jax.random.PRNGKey(9)
    x = jax.random.normal(rng, (4, 16, 12, 16), jnp.float32)
    h = 0.3 * jax.random.normal(jax.random.fold_in(rng, 1),
                                (4, 16), jnp.float32)
    xt = jax.nn.silu(x + h[:, None, None, :])
    mod = ResidualDownsample(32)
    variables = _nontrivial(mod.init(rng, xt, train=False))
    ref = mod.apply(variables, xt, train=False)
    out = packed_downsample(x, variables["params"],
                            variables["batch_stats"], t_vec=h,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)




def test_packed_chain_under_mesh_dp():
    """The packed kernel (the production fused_sampler default) composes with
    data-parallel sharding via shard_map on an 8-device mesh (multi-chip
    sampling: each device runs the kernel on its batch shard)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P

    rng = jax.random.PRNGKey(19)
    x = jax.random.normal(rng, (8, 16, 12, 16), jnp.float32)
    cur, units = x, []
    for i in range(2):
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur, 16)
        units.append(folded)
        cur = ref

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))

    fn = partial(packed_bottleneck_chain, units=units, g=1, interpret=True)
    sharded = jax.jit(jax.shard_map(
        lambda xx: fn(xx), mesh=mesh,
        in_specs=P("data"), out_specs=P("data"), check_vma=False))
    out = sharded(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=1e-4)


def test_resolve_sampler_mode_mapping():
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (
        resolve_sampler_mode)

    # truthy defaults: spec unless the caller opts a TPU run into a measured
    # winner (gaussian3d worker passes default_tpu_mode='packed'); on the CPU
    # test backend both resolve to the spec
    assert resolve_sampler_mode(True) is False
    assert resolve_sampler_mode("true") is False
    assert resolve_sampler_mode(True, default_tpu_mode="packed") is False
    assert resolve_sampler_mode(False) is False
    assert resolve_sampler_mode("packed") == "packed"
    assert resolve_sampler_mode("pallas") == "pallas"
    assert resolve_sampler_mode("packed_interpret") == "packed_interpret"
