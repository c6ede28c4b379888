"""Fused-inference forward for :class:`models.unet_shuffle.ShuffleUNet`.

The DDPM/DDIM sampling chain calls the ShuffleNet denoiser 1000× sequentially
(reference diffusion_gaussian3d.py:445-459); under XLA each ResidualBottleneck
materializes ~12 HBM tensors, making the chain memory-op bound. This module
re-executes the SAME parameter tree through the fused Pallas bottleneck kernel
(:mod:`ops.shuffle_pallas`) with BatchNorm folded into the convolutions:

- every ResidualBottleneck → one `fused_bottleneck` call (one HBM read+write);
- ResidualDownsample / init_conv / TimeMLP / resize / final_conv stay in jnp
  (they are 4-per-net, cheap, and stride-2 depthwise doesn't fit the tile
  halo scheme);
- on non-TPU backends everything falls back to the identical-math XLA spec
  (`reference_bottleneck`), so the function is portable.

Numerical parity with ``ShuffleUNet.apply(..., train=False)`` is tested in
tests/test_shuffle_pallas.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.shuffle_pallas import (bn_affine, fold_bottleneck_params,
                                  fused_bottleneck, packed_bottleneck_chain,
                                  packed_bottleneck_chain_whole,
                                  packed_bottleneck_chain_whole_up,
                                  reference_bottleneck)


def _bottleneck(x, folded, use_pallas):
    if use_pallas == "interpret":     # CPU tests of the kernel path
        return fused_bottleneck(x, folded, interpret=True)
    if use_pallas:
        return fused_bottleneck(x, folded)
    return reference_bottleneck(x, folded)


# Per-block kernel policy for mode "auto", from the round-4 healthy-window
# measurements (BENCHMARKS.md, tools/bench_bottleneck.py): the whole-block
# chain kernels win at narrow channels (2.7× at the 64ch wide-spatial stage,
# ~parity at 128ch) where XLA's shift-add spec re-reads the activation per
# tap, while the per-stage packed-resident kernels win at 256/512ch where
# the whole-chain tiles spill. Channel width ≤ this bar → whole-block chain
# kernels; wider → packed per-stage kernels.
AUTO_WHOLE_MAX_CH = 128


def _parse_auto(mode):
    """'auto'/'auto64'(+'_interpret') → (True, thresh); else (False, None)."""
    m = str(mode)
    if m.endswith("_interpret"):
        m = m[: -len("_interpret")]
    if m.startswith("auto"):
        return True, int(m[4:]) if m[4:] else AUTO_WHOLE_MAX_CH
    return False, None


def resolve_sampler_mode(mode):
    """Map a config ``fused_sampler`` value to ``apply_folded``'s
    ``use_pallas`` argument. Unknown / truthy-default values (True, "true")
    select the BN-folded XLA spec path (False)."""
    m = str(mode)
    if m in ("pallas", "packed", "packed_interpret", "chain",
             "chain_interpret", "interpret") or m.startswith("auto"):
        return m
    return False


def _resolve_mode(use_pallas):
    """'packed'/'chain'/'auto*' off-TPU degrade to interpret kernels."""
    m = str(use_pallas)
    if ((use_pallas in ("packed", "chain") or m.startswith("auto"))
            and jax.default_backend() != "tpu"):
        return m + "_interpret"
    return use_pallas


def _chain(x, units, use_pallas, t_vec=None, inj_after=None):
    """Run consecutive bottlenecks; packed modes fuse per unit, chain modes
    fuse the whole stage into one kernel launch (activations stay in VMEM).
    ``t_vec``/``inj_after`` (chain modes only): fuse the TimeMLP
    x = silu(x + h) between units inj_after-1 and inj_after in-kernel."""
    use_pallas = _resolve_mode(use_pallas)
    if use_pallas in ("chain", "chain_interpret"):
        return packed_bottleneck_chain_whole(
            x, units, t_vec=t_vec, inj_after=inj_after,
            interpret=use_pallas == "chain_interpret")
    assert t_vec is None  # fused injection is a chain-mode-only contract
    if use_pallas in ("packed", "packed_interpret"):
        return packed_bottleneck_chain(
            x, units, interpret=use_pallas == "packed_interpret")
    for u in units:
        x = _bottleneck(x, u, use_pallas)
    return x


def _fold_pw(params, stats, dtype):
    """ConvBnSiLu → (kernel [kh,kw,Cin,Cout], bias) with BN folded."""
    k = params["conv"]["kernel"]
    b = params["conv"].get("bias", 0.0)
    s, t = bn_affine(params["bn"], stats["bn"])
    return (k * s).astype(dtype), (b * s + t).astype(dtype)


def _fold_dw(conv_params, bn_params, bn_stats, dtype):
    k = conv_params["kernel"]
    b = conv_params.get("bias", 0.0)
    s, t = bn_affine(bn_params, bn_stats)
    return (k * s).astype(dtype), (b * s + t).astype(dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv(x, k, b, stride=1, pad=0):
    pad = ((pad, pad), (pad, pad)) if isinstance(pad, int) else pad
    x = x.astype(k.dtype)
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1] // k.shape[2])
    return y + b


def _downsample(x, p, stats, dtype, use_pallas=False, t_vec=None):
    """ResidualDownsample in jnp with folded BNs (reference unet3d.py:53-72);
    packed modes route through the stride-2 Pallas kernel when H and W are
    even (odd grids — e.g. mnist 7² — keep the XLA path). ``t_vec``: TimeMLP
    vector fused as a silu(x + h) prologue (in-kernel on the packed path)."""
    from ..models.unet_shuffle import channel_shuffle

    use_pallas = _resolve_mode(use_pallas)
    if (use_pallas in ("packed", "packed_interpret",
                       "chain", "chain_interpret")
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        from ..ops.shuffle_pallas import packed_downsample
        return packed_downsample(x, p, stats, t_vec=t_vec,
                                 interpret=use_pallas.endswith("interpret"))
    if t_vec is not None:
        x = _silu(x + t_vec[:, None, None, :].astype(x.dtype))

    k, b = _fold_dw(p["b1_dw"], p["b1_bn"], stats["b1_bn"], dtype)
    b1 = _conv(x, k, b, stride=2, pad=1)
    kw, bw = _fold_pw(p["b1_pw"], stats["b1_pw"], dtype)
    b1 = _silu(_conv(b1, kw, bw))

    kw, bw = _fold_pw(p["b2_pw1"], stats["b2_pw1"], dtype)
    b2 = _silu(_conv(x, kw, bw))
    k, b = _fold_dw(p["b2_dw"], p["b2_bn"], stats["b2_bn"], dtype)
    b2 = _conv(b2, k, b, stride=2, pad=1)
    kw, bw = _fold_pw(p["b2_pw2"], stats["b2_pw2"], dtype)
    b2 = _silu(_conv(b2, kw, bw))
    return channel_shuffle(jnp.concatenate([b1, b2], axis=-1))


def _time_h(t_emb, p, dtype):
    """The per-(image, channel) TimeMLP vector h; the block applies
    silu(x + h) (reference unet3d.py:74-88)."""
    h = t_emb @ p["fc1"]["kernel"].astype(dtype) + p["fc1"]["bias"].astype(dtype)
    return _silu(h) @ p["fc2"]["kernel"].astype(dtype) + p["fc2"]["bias"].astype(dtype)


def _time_mlp(x, t_emb, p):
    h = _time_h(t_emb, p, x.dtype)
    return _silu(x + h[:, None, None, :].astype(x.dtype))


def fold_unet(variables: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Pre-fold every BN of a ShuffleUNet variables tree for inference."""
    params, stats = variables["params"], variables["batch_stats"]
    folded: Dict[str, Any] = {"_raw": params, "_stats": stats}

    def unit(prefix):
        return fold_bottleneck_params(params[prefix], stats[prefix], dtype=dtype)

    enc_names = sorted(n for n in params if n.startswith("enc"))
    folded["enc"] = []
    for n in enc_names:
        folded["enc"].append({
            "units": [fold_bottleneck_params(params[n][f"bn{i}"],
                                             stats[n][f"bn{i}"], dtype=dtype)
                      for i in range(4)],
            "name": n,
        })
    folded["mid"] = [unit(f"mid{i}") for i in range(3)]
    dec_names = sorted(n for n in params if n.startswith("dec"))
    folded["dec"] = []
    for n in dec_names:
        folded["dec"].append({
            "units": [fold_bottleneck_params(params[n][f"bn{i}"],
                                             stats[n][f"bn{i}"], dtype=dtype)
                      for i in range(5)],
            "name": n,
        })
    ki, bi = _fold_pw({"conv": params["init_conv"]["conv"],
                       "bn": params["init_conv"]["bn"]},
                      {"bn": stats["init_conv"]["bn"]}, dtype)
    folded["init"] = (ki, bi)
    return folded


def apply_folded(folded: Dict[str, Any], x: jax.Array,
                 t: Optional[jax.Array] = None, *,
                 use_pallas: Optional[bool] = None,
                 dtype=jnp.bfloat16) -> jax.Array:
    """Forward pass matching ShuffleUNet.__call__(train=False).

    ``use_pallas=False`` (default) runs the BN-folded shift-add XLA spec —
    measured 2.1× the flax module on a v5e ([16,256,96,64] unit: 2.19 ms vs
    4.57 ms); ``'pallas'`` selects the v1 fused kernel (slower than the spec
    at narrow channels — kept for comparison); ``'packed'`` selects the v2
    batch-packed whole-chain kernel (lane-packed images, shuffle folded into
    the pointwise weights, zero layout ops between consecutive units);
    ``'chain'`` the v3 whole-block kernels (one launch per network block);
    ``'auto'`` / ``'auto<N>'`` picks per block by channel width — whole-block
    chain kernels up to N (default ``AUTO_WHOLE_MAX_CH``) channels, packed
    per-stage kernels above, following the round-4 hardware measurements;
    ``'packed_interpret'``/``'interpret'`` are the CPU test modes.
    """
    params, stats = folded["_raw"], folded["_stats"]
    if use_pallas is None:
        use_pallas = False
    x = x.astype(dtype)
    ki, bi = folded["init"]

    t_emb = None
    if t is not None:
        t_emb = params["time_embedding"]["embedding"][t].astype(dtype)

    mode = _resolve_mode(use_pallas)
    auto, auto_th = _parse_auto(mode)
    interp_sfx = "_interpret" if str(mode).endswith("_interpret") else ""

    def block_mode(units):
        """Mode for one block; 'auto' picks by the block's channel width
        (a folded unit's k1 is [3,3,C/2])."""
        if not auto:
            return mode
        c = 2 * units[0]["k1"].shape[-1]
        return ("chain" if c <= auto_th else "packed") + interp_sfx

    did_init = False
    shortcuts = []
    for ei, blk in enumerate(folded["enc"]):
        n = blk["name"]
        bmode = block_mode(blk["units"])
        chain_fused = bmode in ("chain", "chain_interpret")
        if chain_fused and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # whole encoder block ([init ConvBnSiLu on block 0] → chain4 →
            # shortcut → TimeMLP → stride-2 downsample) in ONE launch
            from ..ops.shuffle_pallas import packed_encoder_block
            h_vec = (None if t_emb is None
                     else _time_h(t_emb, params[n]["time_mlp"], dtype))
            shortcut, x = packed_encoder_block(
                x.astype(dtype), blk["units"][:4], params[n]["down"],
                stats[n]["down"], t_vec=h_vec,
                init_conv=None if did_init else (ki, bi),
                interpret=bmode == "chain_interpret")
            did_init = True
            shortcuts.append(shortcut)
            continue
        if not did_init:
            x = _silu(_conv(x, ki, bi, stride=1, pad=1))
            did_init = True
        x = _chain(x, blk["units"][:4], bmode)
        shortcut = x
        h_vec = None
        if t_emb is not None:
            h_vec = _time_h(t_emb, params[n]["time_mlp"], dtype)
            if not chain_fused:
                x = _time_mlp(shortcut, t_emb, params[n]["time_mlp"])
                h_vec = None
        x = _downsample(x, params[n]["down"], stats[n]["down"], dtype,
                        bmode, t_vec=h_vec)
        shortcuts.append(shortcut)

    if not did_init:  # a fully-odd grid never entered the fused block
        x = _silu(_conv(x, ki, bi, stride=1, pad=1))
        did_init = True
    x = _chain(x, folded["mid"], block_mode(folded["mid"]))

    fk = params["final_conv"]["kernel"].astype(dtype)
    fb = params["final_conv"].get("bias", jnp.zeros(())).astype(dtype)

    for di, blk in enumerate(folded["dec"]):
        n = blk["name"]
        sc = shortcuts.pop()
        b, h, w, c = x.shape
        last = di == len(folded["dec"]) - 1
        bmode = block_mode(blk["units"])
        chain_fused = bmode in ("chain", "chain_interpret")
        if chain_fused:
            # whole decoder block (2× bilinear upsample → chain4 → TimeMLP
            # → chain1 → [final 1×1 conv on the last block]) in ONE launch;
            # the kernel falls back to XLA resize internally on non-2× grids
            h_vec = (None if t_emb is None
                     else _time_h(t_emb, params[n]["time_mlp"], dtype))
            x = packed_bottleneck_chain_whole_up(
                x.astype(dtype), sc.astype(dtype), blk["units"],
                t_vec=h_vec, inj_after=None if h_vec is None else 4,
                final_proj=(fk, fb) if last else None,
                interpret=bmode == "chain_interpret")
            if last:
                return x
            continue
        x = jax.image.resize(x, (b, sc.shape[1], sc.shape[2], c), "bilinear")
        x = jnp.concatenate([x, sc], axis=-1).astype(dtype)
        x = _chain(x, blk["units"][:4], bmode)
        if t_emb is not None:
            x = _time_mlp(x, t_emb, params[n]["time_mlp"])
        x = _chain(x, blk["units"][4:], bmode)

    return _conv(x, fk, fb)
