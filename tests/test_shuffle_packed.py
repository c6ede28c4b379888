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


def _chain_case(shape, couts, seed=2):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, shape, jnp.float32)
    cur, units = x, []
    for i, co in enumerate(couts):
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur, co)
        units.append(folded)
        cur = ref
    return x, units, cur


@pytest.mark.parametrize("shape,couts", [
    ((4, 16, 12, 16), (16, 16, 8)),    # single row tile, width change
    ((2, 512, 8, 8), (8, 8, 8, 8)),    # 4 units, nj=2 row tiles (halo path)
    ((4, 16, 12, 16), (16,)),          # degenerate 1-unit chain
])
def test_whole_chain_kernel_matches_flax(shape, couts):
    """v3 whole-chain kernel (one pallas launch, overlap-recompute halos)
    == the flax units applied sequentially."""
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_bottleneck_chain_whole)

    x, units, ref = _chain_case(shape, couts)
    out = packed_bottleneck_chain_whole(x, units, g=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_whole_chain_kernel_bf16():
    """Production dtype through the whole-chain kernel."""
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_bottleneck_chain_whole)

    x, units, ref = _chain_case((2, 32, 8, 8), (8, 8, 8))
    units = [{k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
              for k, v in u.items()} for u in units]
    out = packed_bottleneck_chain_whole(x.astype(jnp.bfloat16), units, g=2,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(ref), atol=0.15, rtol=0.1)


def test_full_unet_chain_inference():
    """apply_folded(use_pallas='chain_interpret') ≡ the flax module — whole
    stages through the v3 kernel, packed downsample, XLA time-mlp/resize."""
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    rng = jax.random.PRNGKey(4)
    unet = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                       out_channels=1, base_dim=16, dim_mults=(1, 2))
    x = jax.random.normal(rng, (4, 32, 16, 1), jnp.float32)
    t = jnp.array([3, 7, 1, 9], jnp.int32)
    variables = _nontrivial(unet.init(rng, x, None, t, train=False))
    ref = unet.apply(variables, x, None, t, train=False)
    folded = fold_unet(variables, dtype=jnp.float32)
    out = apply_folded(folded, x, t, use_pallas="chain_interpret",
                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_whole_chain_kernel_time_injection():
    """chain4 -> TimeMLP silu(x+h) -> chain1 fused into ONE kernel launch
    == the flax units with the XLA injection between them."""
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_bottleneck_chain_whole)

    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (4, 16, 12, 16), jnp.float32)
    cur, units = x, []
    for i in range(5):
        if i == 4:  # the injection point: silu(cur + h)
            h = 0.3 * jax.random.normal(jax.random.fold_in(rng, 99),
                                        (4, cur.shape[-1]), jnp.float32)
            cur = jax.nn.silu(cur + h[:, None, None, :])
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur, 16)
        units.append(folded)
        cur = ref
    out = packed_bottleneck_chain_whole(x, units, g=2, t_vec=h, inj_after=4,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=2e-4)


def test_whole_chain_time_injection_fallback():
    """The no-VMEM-tile fallback path applies the same injection in XLA."""
    from vq_vae_gan_diffusion_tpu.ops import shuffle_pallas as sp

    rng = jax.random.PRNGKey(8)
    x = jax.random.normal(rng, (4, 16, 12, 16), jnp.float32)
    cur, units = x, []
    for i in range(3):
        if i == 2:
            h = 0.3 * jax.random.normal(jax.random.fold_in(rng, 98),
                                        (4, cur.shape[-1]), jnp.float32)
            cur = jax.nn.silu(cur + h[:, None, None, :])
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur, 16)
        units.append(folded)
        cur = ref
    orig = sp._pick_tile_chain
    sp._pick_tile_chain = lambda *a, **k: None
    try:
        out = sp.packed_bottleneck_chain_whole(x, units, g=2, t_vec=h,
                                               inj_after=2, interpret=True)
    finally:
        sp._pick_tile_chain = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=2e-4)


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


def test_full_unet_chain_inference_odd_grid():
    """Odd stage grids (mnist-style 14 -> 7) push the downsample onto the
    XLA fallback while the chains stay fused — parity must hold there too."""
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    rng = jax.random.PRNGKey(11)
    unet = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                       out_channels=1, base_dim=16, dim_mults=(1, 2))
    x = jax.random.normal(rng, (4, 14, 12, 1), jnp.float32)
    t = jnp.array([3, 7, 1, 9], jnp.int32)
    variables = _nontrivial(unet.init(rng, x, None, t, train=False))
    ref = unet.apply(variables, x, None, t, train=False)
    folded = fold_unet(variables, dtype=jnp.float32)
    out = apply_folded(folded, x, t, use_pallas="chain_interpret",
                       dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_whole_chain_kernel_fused_upsample():
    """In-kernel 2x bilinear upsample of the x1 branch (+ TimeMLP
    injection) == XLA resize + concat + flax chain with the injection."""
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_bottleneck_chain_whole_up)

    rng = jax.random.PRNGKey(12)
    x_small = jax.random.normal(rng, (4, 8, 6, 8), jnp.float32)
    skip = jax.random.normal(jax.random.fold_in(rng, 1), (4, 16, 12, 8),
                             jnp.float32)
    up = jax.image.resize(x_small, (4, 16, 12, 8), method="bilinear")
    cur = jnp.concatenate([up, skip], axis=-1)
    units = []
    for i in range(3):
        if i == 2:
            h = 0.3 * jax.random.normal(jax.random.fold_in(rng, 97),
                                        (4, cur.shape[-1]), jnp.float32)
            cur = jax.nn.silu(cur + h[:, None, None, :])
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur, 16)
        units.append(folded)
        cur = ref
    out = packed_bottleneck_chain_whole_up(x_small, skip, units, g=2,
                                           t_vec=h, inj_after=2,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=2e-4)


def test_whole_chain_fused_upsample_multi_tile():
    """Row tiles smaller than the image: the half-res halo fetch must
    stitch tile borders exactly (clamped edges only at the true image
    border)."""
    from vq_vae_gan_diffusion_tpu.ops import shuffle_pallas as sp

    rng = jax.random.PRNGKey(13)
    x_small = jax.random.normal(rng, (2, 16, 4, 8), jnp.float32)
    skip = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 8, 8),
                             jnp.float32)
    up = jax.image.resize(x_small, (2, 32, 8, 8), method="bilinear")
    cur = jnp.concatenate([up, skip], axis=-1)
    units = []
    for i in range(2):
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur, 16)
        units.append(folded)
        cur = ref
    orig = sp._pick_tile_chain
    # force th=8 (4 row tiles) to exercise interior halo stitching
    sp._pick_tile_chain = lambda h, w, l, k, even=False: 8 if h == 32 else \
        orig(h, w, l, k, even)
    try:
        out = sp.packed_bottleneck_chain_whole_up(x_small, skip, units, g=2,
                                                  interpret=True)
    finally:
        sp._pick_tile_chain = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=2e-4)


def test_packed_encoder_block_fused():
    """Whole EncoderBlock (chain4 -> shortcut -> TimeMLP -> stride-2
    downsample) in ONE launch == the flax EncoderBlock."""
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import _time_h
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import EncoderBlock
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_encoder_block)

    rng = jax.random.PRNGKey(14)
    x = jax.random.normal(rng, (4, 16, 12, 16), jnp.float32)
    t_emb = jax.random.normal(jax.random.fold_in(rng, 1), (4, 32),
                              jnp.float32)
    mod = EncoderBlock(32)
    variables = _nontrivial(mod.init(rng, x, t_emb, train=False))
    ref_down, ref_sc = mod.apply(variables, x, t_emb, train=False)
    p, s = variables["params"], variables["batch_stats"]
    units = [fold_bottleneck_params(p[f"bn{i}"], s[f"bn{i}"])
             for i in range(4)]
    h = _time_h(t_emb, p["time_mlp"], jnp.float32)
    sc, down = packed_encoder_block(x, units, p["down"], s["down"],
                                    t_vec=h, interpret=True)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_sc),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(down), np.asarray(ref_down),
                               atol=2e-4)


def test_packed_encoder_block_fused_no_time():
    """t_emb=None path (pure chain -> downsample, no injection)."""
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import EncoderBlock
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_encoder_block)

    rng = jax.random.PRNGKey(15)
    x = jax.random.normal(rng, (2, 32, 8, 8), jnp.float32)
    mod = EncoderBlock(16)
    variables = _nontrivial(mod.init(rng, x, None, train=False))
    ref_down, ref_sc = mod.apply(variables, x, None, train=False)
    p, s = variables["params"], variables["batch_stats"]
    units = [fold_bottleneck_params(p[f"bn{i}"], s[f"bn{i}"])
             for i in range(4)]
    sc, down = packed_encoder_block(x, units, p["down"], s["down"],
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_sc),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(down), np.asarray(ref_down),
                               atol=2e-4)


def test_whole_chain_final_conv_epilogue():
    """chain -> final 1x1 conv fused as a kernel epilogue == flax chain +
    XLA conv (the full-width tensor never reaches HBM)."""
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_bottleneck_chain_whole)

    rng = jax.random.PRNGKey(16)
    x = jax.random.normal(rng, (4, 16, 12, 16), jnp.float32)
    cur, units = x, []
    for i in range(2):
        ref, folded = _make_unit(jax.random.fold_in(rng, i), cur, 16)
        units.append(folded)
        cur = ref
    fk = 0.2 * jax.random.normal(jax.random.fold_in(rng, 5), (1, 1, 16, 3),
                                 jnp.float32)
    fb = jnp.array([0.1, -0.2, 0.3], jnp.float32)
    ref_out = jnp.einsum("bhwc,co->bhwo", cur, fk[0, 0]) + fb
    out = packed_bottleneck_chain_whole(x, units, g=2, final_proj=(fk, fb),
                                        interpret=True)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4)


def test_packed_encoder_block_init_prologue():
    """init ConvBnSiLu fused as the encoder-block prologue == XLA conv +
    the fused block (raw image in, halves out)."""
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import _time_h
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import EncoderBlock
    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        _init_conv_xla, packed_encoder_block)

    rng = jax.random.PRNGKey(17)
    raw = jax.random.normal(rng, (4, 16, 12, 3), jnp.float32)
    ki = 0.2 * jax.random.normal(jax.random.fold_in(rng, 2), (3, 3, 3, 16),
                                 jnp.float32)
    bi = 0.05 * jnp.arange(16, dtype=jnp.float32)
    x = _init_conv_xla(raw, ki, bi)
    t_emb = jax.random.normal(jax.random.fold_in(rng, 1), (4, 32),
                              jnp.float32)
    mod = EncoderBlock(32)
    variables = _nontrivial(mod.init(rng, x, t_emb, train=False))
    ref_down, ref_sc = mod.apply(variables, x, t_emb, train=False)
    p, s = variables["params"], variables["batch_stats"]
    units = [fold_bottleneck_params(p[f"bn{i}"], s[f"bn{i}"])
             for i in range(4)]
    h = _time_h(t_emb, p["time_mlp"], jnp.float32)
    sc, down = packed_encoder_block(raw, units, p["down"], s["down"],
                                    t_vec=h, init_conv=(ki, bi),
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_sc),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(down), np.asarray(ref_down),
                               atol=3e-4)


def test_full_unet_chain_inference_bf16():
    """Production dtype through the fully-fused chain path (init prologue,
    encoder blocks, upsample + injection + final epilogue) — matches the
    f32 flax module to bf16 tolerance."""
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    rng = jax.random.PRNGKey(18)
    unet = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                       out_channels=1, base_dim=16, dim_mults=(1, 2))
    x = jax.random.normal(rng, (4, 32, 16, 1), jnp.float32)
    t = jnp.array([3, 7, 1, 9], jnp.int32)
    variables = _nontrivial(unet.init(rng, x, None, t, train=False))
    ref = unet.apply(variables, x, None, t, train=False)
    folded = fold_unet(variables, dtype=jnp.bfloat16)
    out = apply_folded(folded, x, t, use_pallas="chain_interpret",
                       dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(ref), atol=0.25, rtol=0.1)


def test_chain_kernel_under_mesh_dp():
    """The whole-chain kernel composes with data-parallel sharding via
    shard_map on an 8-device mesh (multi-chip sampling: each device runs
    the kernel on its batch shard)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P

    from vq_vae_gan_diffusion_tpu.ops.shuffle_pallas import (
        packed_bottleneck_chain_whole)

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

    fn = partial(packed_bottleneck_chain_whole, units=units, g=1,
                 interpret=True)
    sharded = jax.jit(jax.shard_map(
        lambda xx: fn(xx), mesh=mesh,
        in_specs=P("data"), out_specs=P("data"), check_vma=False))
    out = sharded(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), atol=1e-4)


def test_full_unet_auto_inference():
    """apply_folded(use_pallas='auto16') ≡ the flax module — the per-block
    channel policy must produce a genuinely MIXED forward here (base 16,
    mults (1,2): the 16ch blocks take the whole-block chain kernels, the
    32ch blocks the packed per-stage kernels) and still match exactly."""
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    rng = jax.random.PRNGKey(11)
    unet = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                       out_channels=1, base_dim=16, dim_mults=(1, 2))
    x = jax.random.normal(rng, (4, 32, 16, 1), jnp.float32)
    t = jnp.array([3, 7, 1, 9], jnp.int32)
    variables = _nontrivial(unet.init(rng, x, None, t, train=False))
    ref = unet.apply(variables, x, None, t, train=False)
    folded = fold_unet(variables, dtype=jnp.float32)
    out = apply_folded(folded, x, t, use_pallas="auto16", dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # default-threshold auto (every block ≤128ch here → all-chain) also matches
    out2 = apply_folded(folded, x, t, use_pallas="auto", dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-4)


def test_resolve_sampler_mode_mapping():
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (
        resolve_sampler_mode)

    assert resolve_sampler_mode(True) is False          # default → XLA spec
    assert resolve_sampler_mode("true") is False
    assert resolve_sampler_mode("packed") == "packed"
    assert resolve_sampler_mode("chain") == "chain"
    assert resolve_sampler_mode("auto") == "auto"
    assert resolve_sampler_mode("auto64") == "auto64"
