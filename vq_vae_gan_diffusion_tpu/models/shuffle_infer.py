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
                                  reference_bottleneck)


def _bottleneck(x, folded, use_pallas):
    if use_pallas == "interpret":     # CPU tests of the kernel path
        return fused_bottleneck(x, folded, interpret=True)
    if use_pallas:
        return fused_bottleneck(x, folded)
    return reference_bottleneck(x, folded)


def resolve_sampler_mode(mode, default_tpu_mode=False):
    """Map a config ``fused_sampler`` value to ``apply_folded``'s
    ``use_pallas`` argument.

    Explicit kernel names pass through. For truthy-default values (True,
    "true") the caller chooses via ``default_tpu_mode`` what a TPU run gets:
    the gaussian3d DDPM sampler passes ``'packed'`` — the measured winner at
    its flagship shape (9.33 vs 11.84 s per 1000-step chain against the
    BN-folded XLA spec, BENCHMARKS.md 2026-08-21) — while the discrete
    composite keeps the spec (its narrow ShuffleNet prior is unmeasured
    under packed; defaults only flip on a healthy-window measurement).

    The v3 whole-chain/auto family was deleted in round 4: it never compiled
    on hardware (reproducible tpu_compile_helper crash across 3
    healthy-window attempts) and its per-block policy LOST where it did
    compile (37.5 vs 42.2 steps/s on the discrete prior)."""
    m = str(mode).lower()
    if m in ("pallas", "packed", "packed_interpret", "interpret"):
        return m
    if m in ("off", "false", "none", "0", ""):
        return False
    if m == "chain" or m.startswith("auto"):
        raise ValueError(
            f"fused_sampler={mode!r} was removed in round 4 (whole-chain/auto "
            "kernels deleted: never compiled on hardware and lost where they "
            "did). Use 'packed', 'pallas', True, or False.")
    if mode and default_tpu_mode and jax.default_backend() == "tpu":
        return default_tpu_mode
    return False


def _resolve_mode(use_pallas):
    """'packed' off-TPU degrades to the interpret kernel."""
    if use_pallas == "packed" and jax.default_backend() != "tpu":
        return "packed_interpret"
    return use_pallas


def _chain(x, units, use_pallas):
    """Run consecutive bottlenecks; packed mode fuses per unit with zero
    layout ops between consecutive units."""
    use_pallas = _resolve_mode(use_pallas)
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
    if (use_pallas in ("packed", "packed_interpret")
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
    4.57 ms); ``'packed'`` selects the v2 batch-packed kernel (lane-packed
    images, shuffle folded into the pointwise weights, zero layout ops
    between consecutive units) — the measured production winner (1.27× the
    spec on the 1000-step DDPM chain, BENCHMARKS.md 2026-08-21);
    ``'pallas'`` the v1 per-unit fused kernel (slower than the spec at
    narrow channels — kept for comparison);
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

    x = _silu(_conv(x, ki, bi, stride=1, pad=1))
    shortcuts = []
    for blk in folded["enc"]:
        n = blk["name"]
        x = _chain(x, blk["units"][:4], mode)
        shortcut = x
        if t_emb is not None:
            x = _time_mlp(shortcut, t_emb, params[n]["time_mlp"])
        x = _downsample(x, params[n]["down"], stats[n]["down"], dtype, mode)
        shortcuts.append(shortcut)

    x = _chain(x, folded["mid"], mode)

    fk = params["final_conv"]["kernel"].astype(dtype)
    fb = params["final_conv"].get("bias", jnp.zeros(())).astype(dtype)

    for blk in folded["dec"]:
        n = blk["name"]
        sc = shortcuts.pop()
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, sc.shape[1], sc.shape[2], c), "bilinear")
        x = jnp.concatenate([x, sc], axis=-1).astype(dtype)
        x = _chain(x, blk["units"][:4], mode)
        if t_emb is not None:
            x = _time_mlp(x, t_emb, params[n]["time_mlp"])
        x = _chain(x, blk["units"][4:], mode)

    return _conv(x, fk, fb)
