"""Fused Pallas TPU kernels for ShuffleNet-v2 bottleneck units (inference).

Why: the DDPM sampling chain (reference unet3d.py inside
diffusion_gaussian3d.py's 1000-step reverse loop) is memory-op bound on TPU —
each ``ResidualBottleneck`` materializes ~12 HBM-sized tensors (split, two
depthwise convs, four BN affines, three pointwise convs, SiLUs, concat,
channel shuffle), so a [16,256,96,64] unit costs ~12 round trips of ~50 MB.
XLA cannot fuse across the layout ops. This kernel computes the WHOLE unit —
  split → [dw3×3 → BN] ∥ [pw → dw3×3 → BN → pw] → SiLU → concat → shuffle
— inside VMEM with one HBM read of the input tile and one write of the
output tile.

BatchNorm is folded into the neighbouring convolutions beforehand
(:func:`fold_conv_bn`): at inference BN is the affine y = γ(x−μ)/√(σ²+ε)+β,
so conv(+bias)+BN ≡ conv with scaled weights and shifted bias.

Layout: NHWC (lanes = channels). The H axis is tiled; each grid step receives
its tile core plus 1-row halos as three separately BlockSpec'd inputs (the
halos pre-gathered with strided slices — overlapping windows cannot be
expressed as BlockSpecs, and manual ANY-space DMA of unaligned slices does not
lower). Depthwise 3×3 is 9 shifted multiply-accumulates on the VMEM-resident
tile; pointwise convs are MXU matmuls over [tile·W, C] views.

Status (BENCHMARKS.md): numerically exact, but at 3.8 ms/unit it trails its
own XLA shift-add spec (2.2 ms) on [16,256,96,64] — the production
``fused_sampler`` default is therefore the spec path; this kernel is opt-in.

Matches ``models/unet_shuffle.py`` numerically (see tests/test_shuffle_pallas.py);
used by :mod:`models.shuffle_infer` for the sampling path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def bn_affine(bn_params: Dict[str, Any], bn_stats: Dict[str, Any],
              eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Inference BatchNorm as (scale, shift): y = x*scale + shift."""
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    shift = bn_params["bias"] - bn_stats["mean"] * scale
    return scale, shift


def fold_conv_bn(kernel: jax.Array, bias: jax.Array, scale: jax.Array,
                 shift: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Fold a following BN affine into conv weights: BN(conv(x)) ≡ conv'(x).

    ``kernel`` [..., Cout] (HWIO, works for depthwise [3,3,1,C] too since the
    trailing dim is the BN'd channel axis)."""
    return kernel * scale, bias * scale + shift


# ---------------------------------------------------------------------------
# Fused ResidualBottleneck kernel
# ---------------------------------------------------------------------------

def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dw9(tile, k, th, w):
    """Depthwise 3×3 on a [th+2, w+2, C] VMEM tile → [th, w, C].

    9 shifted multiply-accumulates; k is [3, 3, C]."""
    acc = tile[0:th, 0:w, :] * k[0, 0]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            acc = acc + tile[dy:dy + th, dx:dx + w, :] * k[dy, dx]
    return acc


def _bottleneck_kernel(core, top, bot, k1, b1, w1, c1, w2, c2, k2, b2, w3, c3,
                       out_ref, *, th: int, w: int, wp: int,
                       cin: int, cout: int, acc_dtype):
    """One grid step: rows [j*th, j*th+th) of sample b, whole unit in VMEM.

    The 1-row halos arrive as separate BlockSpec'd inputs (``top``/``bot``,
    pre-gathered outside — overlapping halo windows can't be expressed as
    BlockSpecs, and manual ANY-space DMA of unaligned slices doesn't lower)."""
    j = pl.program_id(1)
    ch = cin // 2
    co2 = cout // 2

    xtile = jnp.concatenate([top[0, 0], core[0, 0], bot[0, 0]], axis=0)  # [th+2, wp, C]
    x1 = xtile[:, :, 0:ch]           # branch 1 (halo'd)
    x2 = xtile[:, :, ch:cin]         # branch 2 (halo'd)

    # branch1: dw3x3(+folded BN) → pw(+folded BN) → SiLU
    t1 = _dw9(x1, k1[:], th, w) + b1[:]
    t1 = jnp.dot(t1.reshape(th * w, ch), w1[:],
                 preferred_element_type=acc_dtype)
    t1 = _silu(t1 + c1[:])  # stays f32: mosaic only interleaves 32-bit minor dims

    # branch2: pw+SiLU on the full halo'd tile (so the dw that follows has its
    # halo), then dw3x3(+BN), then pw+SiLU
    t2 = jnp.dot(x2.reshape((th + 2) * wp, ch), w2[:],
                 preferred_element_type=acc_dtype)
    t2 = _silu(t2 + c2[:]).astype(x2.dtype).reshape(th + 2, wp, ch)
    # the reference zero-pads AFTER this pointwise conv, so at the image's
    # outer 1-pixel ring the dw halo must be 0, not silu(pw(0)) = silu(c2);
    # interior tile halos carry real neighbour rows and stay untouched
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 1)
    nj = pl.num_programs(1)
    border = ((col == 0) | (col >= w + 1) |
              ((row == 0) & (j == 0)) | ((row == th + 1) & (j == nj - 1)))
    t2 = jnp.where(border, jnp.zeros_like(t2), t2)
    t2 = _dw9(t2, k2[:], th, w) + b2[:]
    t2 = jnp.dot(t2.reshape(th * w, ch), w3[:],
                 preferred_element_type=acc_dtype)
    t2 = _silu(t2 + c3[:])

    # emit the branches in CONCAT order; the channel_shuffle interleave is a
    # lane permutation mosaic handles poorly (no 16-bit minor-dim insertion,
    # no (th,w,co2,2)→(th,w,cout) shape cast), so the caller applies it in XLA
    # where it fuses into the next op's prologue
    cc = jnp.concatenate([t1, t2], axis=1)            # [th*w, cout]
    out_ref[0] = cc.reshape(th, w, cout).astype(out_ref.dtype)


def _pick_tile(h: int) -> int:
    for th in (64, 32, 16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(x: jax.Array, params: Dict[str, jax.Array],
                     *, interpret: bool = False) -> jax.Array:
    """Fused inference ResidualBottleneck.

    x [B,H,W,Cin]; params (BN-folded, see :func:`fold_bottleneck_params`):
      k1 [3,3,Ch]  b1 [Ch]   — branch1 depthwise (+BN)
      w1 [Ch,Co2]  c1 [Co2]  — branch1 pointwise (+BN, SiLU after)
      w2 [Ch,Ch]   c2 [Ch]   — branch2 pointwise 1
      k2 [3,3,Ch]  b2 [Ch]   — branch2 depthwise (+BN)
      w3 [Ch,Co2]  c3 [Co2]  — branch2 pointwise 2
    Returns [B,H,W,Cout] with Cout = 2*Co2.
    """
    b, h, w, cin = x.shape
    co2 = params["w1"].shape[-1]
    cout = 2 * co2
    th = _pick_tile(h)
    nj = h // th
    wp = -(-(w + 2) // 16) * 16  # sublane-align W for bf16 tiles (16, 128)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    # halo rows per tile, gathered with strided slices: top_j = xp[:, j*th],
    # bot_j = xp[:, j*th + th + 1]
    top = xp[:, 0:nj * th:th].reshape(b, nj, 1, wp, cin)
    bot = xp[:, th + 1::th][:, :nj].reshape(b, nj, 1, wp, cin)
    core = xp[:, 1:h + 1].reshape(b, nj, th, wp, cin)
    acc_dtype = jnp.float32
    kern = functools.partial(_bottleneck_kernel, th=th, w=w, wp=wp, cin=cin,
                             cout=cout, acc_dtype=acc_dtype)
    grid = (b, nj)
    # weights: replicate to every grid step (index_map → block 0)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    p = params
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, th, wp, cin), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, wp, cin), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, wp, cin), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(p["k1"].shape), wspec(p["b1"].shape),
            wspec(p["w1"].shape), wspec(p["c1"].shape),
            wspec(p["w2"].shape), wspec(p["c2"].shape),
            wspec(p["k2"].shape), wspec(p["b2"].shape),
            wspec(p["w3"].shape), wspec(p["c3"].shape),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(core, top, bot, p["k1"], p["b1"], p["w1"], p["c1"], p["w2"], p["c2"],
      p["k2"], p["b2"], p["w3"], p["c3"])
    # channel_shuffle(groups=2) on the kernel's concat-order output (see
    # kernel comment: interleave is done here in XLA, not in mosaic)
    return out.reshape(b, h, w, 2, co2).swapaxes(-1, -2).reshape(b, h, w, cout)


# ---------------------------------------------------------------------------
# Param folding from the flax ResidualBottleneck tree
# ---------------------------------------------------------------------------

def fold_bottleneck_params(unit_params: Dict[str, Any],
                           unit_stats: Dict[str, Any],
                           dtype=None) -> Dict[str, jax.Array]:
    """Fold a models/unet_shuffle.ResidualBottleneck param+batch_stats subtree
    into the fused kernel's argument set.

    flax tree (momentum BNs use eps 1e-5, flax default — matching training):
      b1_dw {kernel [3,3,1,Ch], bias}  b1_bn {scale,bias} + stats
      b1_pw {conv{kernel [1,1,Ch,Co2],bias}, bn{...}}
      b2_pw1 {conv,bn}  b2_dw  b2_bn  b2_pw2 {conv,bn}
    """
    def dw_fold(conv_name, bn_name):
        k = unit_params[conv_name]["kernel"][:, :, 0, :]       # [3,3,Ch]
        bias = unit_params[conv_name].get("bias", 0.0)
        s, t = bn_affine(unit_params[bn_name], unit_stats[bn_name])
        return k * s, bias * s + t

    def pw_fold(name):
        conv = unit_params[name]["conv"]
        k = conv["kernel"][0, 0]                               # [Cin, Cout]
        bias = conv.get("bias", 0.0)
        s, t = bn_affine(unit_params[name]["bn"], unit_stats[name]["bn"])
        return k * s, bias * s + t

    k1, b1 = dw_fold("b1_dw", "b1_bn")
    w1, c1 = pw_fold("b1_pw")
    w2, c2 = pw_fold("b2_pw1")
    k2, b2 = dw_fold("b2_dw", "b2_bn")
    w3, c3 = pw_fold("b2_pw2")
    two_d = lambda v: v.reshape(1, -1)  # TPU VMEM wants ≥2-D operands
    out = dict(k1=k1, b1=two_d(b1), w1=w1, c1=two_d(c1), w2=w2, c2=two_d(c2),
               k2=k2, b2=two_d(b2), w3=w3, c3=two_d(c3))
    if dtype is not None:
        out = {k: v.astype(dtype) for k, v in out.items()}
    return out


# ---------------------------------------------------------------------------
# Batch-packed whole-unit kernel (v2)
# ---------------------------------------------------------------------------
#
# The v1 kernel above loses to XLA at the narrow-channel stages because its
# lanes are only ch=32/64 wide (25-50% VPU/MXU utilization) and its prep
# (full-tensor pad + gathered core/top/bot views) costs several extra HBM
# round trips. v2 fixes both:
#
# - PACKED LANES: G = 128//ch images share the lane dimension, so a branch
#   half is [B/G, H, W, G*ch] with full 128-lane rows. Depthwise taps shift
#   only along H (row offsets) and W (sublane shifts) — lanes never move.
#   Pointwise convs become single MXU matmuls against block-diagonal
#   [G*ch, G*co2] weights (kron(I_G, w)).
# - SHUFFLE FOLDED INTO WEIGHTS: channel_shuffle(concat(t1, t2)) followed by
#   the next unit's split is a fixed permutation with disjoint supports, and
#   permutations commute with the elementwise SiLU — so the shuffled output
#   halves are y_a = silu(u1·W1a + u2·W3a + ca), y_b = silu(u1·W1b + u2·W3b
#   + cb) with column-interleaved copies of w1/w3 built at fold time. The
#   kernel does NO lane permutation, and consecutive units chain directly:
#   unit i's (y_a, y_b) are unit i+1's (x1, x2).
# - NO PREP COPIES: the core tile is BlockSpec'd straight out of the packed
#   input; only the 1-row top/bot halos are gathered in XLA (2/th of the
#   tensor), with zeros at the image edges.


def _mm_rows(x3, w, bias=None, out_dtype=jnp.float32):
    """[R, W, L] @ [L, Lo] -> [R, W, Lo] f32, zero-padding W to a multiple
    of 8 so the (R, W)->R*W merge reshape is sublane-aligned for Mosaic."""
    r, ww, l = x3.shape
    w8 = -(-ww // 8) * 8
    if w8 != ww:
        x3 = jnp.concatenate([x3, jnp.zeros((r, w8 - ww, l), x3.dtype)],
                             axis=1)
    y = jnp.dot(x3.reshape(r * w8, l), w,
                preferred_element_type=out_dtype)
    y = y.reshape(r, w8, w.shape[-1])[:, 0:ww]
    return y if bias is None else y + bias


def _dwpad9(xt, k, b, th, w, j_first, j_last):
    """Depthwise 3x3 with zero borders on a halo'd [th+2, W, L] f32 tile.

    Pads W in-VMEM, masks the halo rows at the image's first/last row tile,
    returns [th, W, L]."""
    z = jnp.zeros((th + 2, 1, xt.shape[-1]), xt.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    edge = (j_first & (row == 0)) | (j_last & (row == th + 1))
    xt = jnp.where(edge, jnp.zeros_like(xt), xt)
    xp = jnp.concatenate([z, xt, z], axis=1)          # [th+2, W+2, L]
    acc = xp[0:th, 0:w, :] * k[0, 0]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            acc = acc + xp[dy:dy + th, dx:dx + w, :] * k[dy, dx]
    return acc + b


def _packed_kernel(x1c, x1t, x1b, x2c, x2t, x2b, k1, b1, k2, b2, w2, c2,
                   w1a, w3a, ca, w1b, w3b, cb, out1, out2,
                   *, th: int, w: int, nj: int, mm_dtype):
    j = pl.program_id(1)
    j_first, j_last = j == 0, j == nj - 1
    l_in = x1c.shape[-1]

    def halo(c, t, b):                     # [th+2, W, L] f32
        return jnp.concatenate([t[0, 0], c[0], b[0, 0]],
                               axis=0).astype(jnp.float32)

    # branch1: dw3x3(+BN) -> (final pw folded below)
    u1 = _dwpad9(halo(x1c, x1t, x1b), k1[:], b1[:], th, w, j_first, j_last)

    # branch2: pw+SiLU on the halo'd tile (the dw that follows needs the
    # neighbour rows), borders re-zeroed (reference pads AFTER this pw),
    # then dw3x3(+BN)
    x2 = halo(x2c, x2t, x2b)
    t2 = _silu(_mm_rows(x2.astype(mm_dtype), w2[:], c2[:]))
    # the reference zero-pads AFTER this pw, so at the image's first/last row
    # the halo must be 0, not silu(pw(0)); the W edges are zero-padded by
    # _dwpad9 itself
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    border = (j_first & (row == 0)) | (j_last & (row == th + 1))
    t2 = jnp.where(border, jnp.zeros_like(t2), t2)
    u2 = _dwpad9(t2, k2[:], b2[:], th, w,
                 jnp.asarray(False), jnp.asarray(False))

    # final pointwise convs with SiLU and the channel shuffle folded in
    u1m = u1.astype(mm_dtype)
    u2m = u2.astype(mm_dtype)
    y1 = _silu(_mm_rows(u1m, w1a[:]) + _mm_rows(u2m, w3a[:]) + ca[:])
    y2 = _silu(_mm_rows(u1m, w1b[:]) + _mm_rows(u2m, w3b[:]) + cb[:])
    out1[0] = y1.astype(out1.dtype)
    out2[0] = y2.astype(out2.dtype)


def pick_group(batch: int, ch: int, co2: int) -> int:
    """Largest G dividing batch with G*max(ch, co2) <= 128."""
    g = max(1, 128 // max(ch, co2))
    while batch % g:
        g -= 1
    return g


def pack_images(x: jax.Array, g: int) -> jax.Array:
    """[B, H, W, C] -> [B/G, H, W, G*C] (image g of a group occupies lane
    block [g*C, (g+1)*C))."""
    b, h, w, c = x.shape
    return x.reshape(b // g, g, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
        b // g, h, w, g * c)


def unpack_images(x: jax.Array, g: int) -> jax.Array:
    bp, h, w, l = x.shape
    return x.reshape(bp, h, w, g, l // g).transpose(0, 3, 1, 2, 4).reshape(
        bp * g, h, w, l // g)


def fold_bottleneck_params_packed(p: Dict[str, jax.Array], g: int,
                                  dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Expand a :func:`fold_bottleneck_params` dict for the packed kernel.

    Depthwise taps/biases are lane-tiled xG; w2 becomes kron(I_G, w2); the
    final pointwise pair (w1, w3) is column-interleaved per the channel
    shuffle (out[2i] = t1[i], out[2i+1] = t2[i]) and split into the
    (a = first, b = second) output halves, then block-diagonalized."""
    ch = p["w2"].shape[0]
    co2 = p["w1"].shape[-1]
    if co2 % 2:
        raise ValueError("packed kernel needs even per-branch width")
    eye = jnp.eye(g, dtype=jnp.float32)

    def tile_lane(v):          # [..., ch] -> [..., g*ch]
        return jnp.concatenate([v] * g, axis=-1)

    def blockdiag(w):          # [a, b] -> [g*a, g*b]
        return jnp.einsum("gh,ab->gahb", eye, w.astype(jnp.float32)).reshape(
            g * w.shape[0], g * w.shape[1])

    w1 = p["w1"].astype(jnp.float32)
    w3 = p["w3"].astype(jnp.float32)
    c1 = p["c1"].reshape(-1).astype(jnp.float32)
    c3 = p["c3"].reshape(-1).astype(jnp.float32)
    half = co2 // 2
    r1, r3 = w1.shape[0], w3.shape[0]   # may differ (downsample: C vs co2)
    w1a = jnp.zeros((r1, co2), jnp.float32).at[:, 0::2].set(w1[:, :half])
    w3a = jnp.zeros((r3, co2), jnp.float32).at[:, 1::2].set(w3[:, :half])
    w1b = jnp.zeros((r1, co2), jnp.float32).at[:, 0::2].set(w1[:, half:])
    w3b = jnp.zeros((r3, co2), jnp.float32).at[:, 1::2].set(w3[:, half:])
    ca = jnp.zeros((co2,), jnp.float32).at[0::2].set(c1[:half]).at[1::2].set(
        c3[:half])
    cb = jnp.zeros((co2,), jnp.float32).at[0::2].set(c1[half:]).at[1::2].set(
        c3[half:])
    out = {
        "k1": tile_lane(p["k1"]).astype(dtype),
        "b1": tile_lane(p["b1"].reshape(1, -1)),
        "k2": tile_lane(p["k2"]).astype(dtype),
        "b2": tile_lane(p["b2"].reshape(1, -1)),
        "w2": blockdiag(p["w2"]).astype(dtype),
        "c2": tile_lane(p["c2"].reshape(1, -1)),
        "w1a": blockdiag(w1a).astype(dtype),
        "w3a": blockdiag(w3a).astype(dtype),
        "w1b": blockdiag(w1b).astype(dtype),
        "w3b": blockdiag(w3b).astype(dtype),
        "ca": tile_lane(ca.reshape(1, -1)),
        "cb": tile_lane(cb.reshape(1, -1)),
    }
    # biases/affines stay f32 (added to f32 accumulators in-kernel)
    for k in ("b1", "b2", "c2", "ca", "cb"):
        out[k] = out[k].astype(jnp.float32)
    return out


def _pick_tile_packed(h: int, w: int, l: int) -> int:
    """Largest row tile (any divisor of h) with ~<=3.5 MB per f32 array."""
    budget = 3.5 * 2 ** 20 / 4
    for t in sorted((d for d in range(1, min(h, 256) + 1) if h % d == 0),
                    reverse=True):
        if (t + 2) * (w + 2) * l <= budget:
            return t
    return 1


def _edge_rows(x: jax.Array, th: int) -> Tuple[jax.Array, jax.Array]:
    """top_j = row j*th - 1 (zeros for j=0), bot_j = row (j+1)*th (zeros for
    the last tile), as [Bp, nj, 1, W, L]."""
    bp, h, w, l = x.shape
    nj = h // th
    z = jnp.zeros((bp, 1, w, l), x.dtype)
    top = jnp.concatenate([z, x[:, th - 1:h - 1:th]], axis=1)
    bot = jnp.concatenate([x[:, th:h:th], z], axis=1)
    return (top.reshape(bp, nj, 1, w, l), bot.reshape(bp, nj, 1, w, l))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck_packed(x1: jax.Array, x2: jax.Array,
                            params: Dict[str, jax.Array], *,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Whole ResidualBottleneck on batch-packed branch halves.

    ``x1``/``x2`` [Bp, H, W, L=G*ch] from :func:`pack_images`; ``params``
    from :func:`fold_bottleneck_params_packed`. Returns the two SHUFFLED
    output halves [Bp, H, W, G*co2] — feed them straight into the next
    unit, or ``unpack_images`` + concat for the stage output.
    """
    bp, h, w, l_in = x1.shape
    l_out = params["w1a"].shape[-1]
    th = _pick_tile_packed(h, w, max(l_in, l_out))
    nj = h // th
    x1t, x1b = _edge_rows(x1, th)
    x2t, x2b = _edge_rows(x2, th)
    core = lambda l: pl.BlockSpec((1, th, w, l), lambda i, j: (i, j, 0, 0),
                                  memory_space=pltpu.VMEM)
    halo = lambda l: pl.BlockSpec((1, 1, 1, w, l), lambda i, j: (i, j, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    p = params
    kern = functools.partial(_packed_kernel, th=th, w=w, nj=nj,
                             mm_dtype=p["w2"].dtype)
    y1, y2 = pl.pallas_call(
        kern,
        grid=(bp, nj),
        out_shape=[jax.ShapeDtypeStruct((bp, h, w, l_out), x1.dtype)] * 2,
        in_specs=[core(l_in), halo(l_in), halo(l_in),
                  core(l_in), halo(l_in), halo(l_in),
                  wspec(p["k1"]), wspec(p["b1"]), wspec(p["k2"]),
                  wspec(p["b2"]), wspec(p["w2"]), wspec(p["c2"]),
                  wspec(p["w1a"]), wspec(p["w3a"]), wspec(p["ca"]),
                  wspec(p["w1b"]), wspec(p["w3b"]), wspec(p["cb"])],
        out_specs=[core(l_out), core(l_out)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x1, x1t, x1b, x2, x2t, x2b, p["k1"], p["b1"], p["k2"], p["b2"],
      p["w2"], p["c2"], p["w1a"], p["w3a"], p["ca"], p["w1b"], p["w3b"],
      p["cb"])
    return y1, y2


def packed_bottleneck_chain(x: jax.Array, units, *, g: int = None,
                            interpret: bool = False) -> jax.Array:
    """Run consecutive ResidualBottlenecks through the packed kernel.

    ``units`` — list of :func:`fold_bottleneck_params` dicts (unpacked form;
    packed expansion is cached per (id, g) by the caller via
    fold_bottleneck_params_packed upstream — here we accept either form).
    Pack/unpack happen once around the whole chain; between units the two
    shuffled halves chain with no layout ops at all.
    """
    ch = x.shape[-1] // 2
    if g is None:
        g, c = 128, ch
        for u in units:
            co2 = u["w1"].shape[-1]
            g = min(g, pick_group(x.shape[0], c, co2))
            c = co2   # next unit's per-branch width
    x1 = pack_images(x[..., :ch], g)
    x2 = pack_images(x[..., ch:], g)
    for u in units:
        pu = u if "w1a" in u else fold_bottleneck_params_packed(
            u, g, dtype=x.dtype)
        x1, x2 = fused_bottleneck_packed(x1, x2, pu, interpret=interpret)
    return jnp.concatenate([unpack_images(x1, g), unpack_images(x2, g)],
                           axis=-1)


# ---------------------------------------------------------------------------
# Batch-packed stride-2 ResidualDownsample kernel
# ---------------------------------------------------------------------------
#
# Same packing + folded-shuffle ideas as the bottleneck v2 kernel, with
# stride-2 depthwise convs. Mosaic does not lower strided slices on >2-D
# refs ("only 2D gather"), so the stride-2 taps are expressed with free
# reshapes instead: column parity by merging (W, L) -> (W/2, 2L) lanes
# (even cols = lanes [:L], odd = [L:]), row parity by splitting the major
# dim (R, ...) -> (R/2, 2, ...).


def fold_downsample_params(p: Dict[str, Any], stats: Dict[str, Any]
                           ) -> Dict[str, jax.Array]:
    """ResidualDownsample params+stats -> the bottleneck-style folded dict
    (k1/b1 = b1 depthwise+BN, w1/c1 = b1 pointwise, w2/c2 = b2 pointwise 1,
    k2/b2 = b2 depthwise+BN, w3/c3 = b2 pointwise 2), reusing
    :func:`fold_bottleneck_params_packed` for the packed expansion."""
    def dw_fold(conv, bn, st):
        k = p[conv]["kernel"][:, :, 0, :]
        bias = p[conv].get("bias", 0.0)
        s, t = bn_affine(p[bn], st)
        return k * s, (bias * s + t).reshape(1, -1)

    def pw_fold(name, st):
        conv = p[name]["conv"]
        k = conv["kernel"][0, 0]
        bias = conv.get("bias", 0.0)
        s, t = bn_affine(p[name]["bn"], st["bn"])
        return k * s, (bias * s + t).reshape(1, -1)

    k1, b1 = dw_fold("b1_dw", "b1_bn", stats["b1_bn"])
    w1, c1 = pw_fold("b1_pw", stats["b1_pw"])
    w2, c2 = pw_fold("b2_pw1", stats["b2_pw1"])
    k2, b2 = dw_fold("b2_dw", "b2_bn", stats["b2_bn"])
    w3, c3 = pw_fold("b2_pw2", stats["b2_pw2"])
    return dict(k1=k1, b1=b1, w1=w1, c1=c1, w2=w2, c2=c2, k2=k2, b2=b2,
                w3=w3, c3=c3)


def _dw2_9(xp, k, b, tho, wo):
    """Stride-2 depthwise 3x3 on a zero-padded [2*tho+2, W+2, L] tile ->
    [tho, wo=W/2, L]. out[i,j] = sum_{dy,dx} xp[2i+dy, 2j+dx] * k[dy,dx]."""
    r2, wp2, l = xp.shape
    # pad the padded-width to a multiple of 16 so both the source sublane
    # count and the parity-merged half are 8-aligned for the Mosaic reshape
    w16 = -(-wp2 // 16) * 16
    if w16 != wp2:
        xp = jnp.concatenate(
            [xp, jnp.zeros((r2, w16 - wp2, l), xp.dtype)], axis=1)
        wp2 = w16
    xm = xp.reshape(r2 // 2, 2, wp2 // 2, 2 * l)
    acc = None
    for dy in range(3):
        rsel = (xm[:, dy] if dy < 2 else xm[:, 0][1:])[0:tho]
        for dx in range(3):
            if dx == 0:
                tap = rsel[:, 0:wo, 0:l]            # even cols 0, 2, ...
            elif dx == 1:
                tap = rsel[:, 0:wo, l:2 * l]        # odd cols 1, 3, ...
            else:
                tap = rsel[:, 1:wo + 1, 0:l]        # even cols 2, 4, ...
            t = tap * k[dy, dx]
            acc = t if acc is None else acc + t
    return acc + b


def _packed_down_kernel(*refs, tho: int, w: int, nj: int, mm_dtype,
                        inject: bool = False):
    xc, xt, xb = refs[:3]
    base = 3
    tv = None
    if inject:
        tv = refs[base]
        base += 1
    (k1, b1, k2, b2, w2, c2, w1a, w3a, ca, w1b, w3b, cb) = refs[base:base + 12]
    out1, out2 = refs[base + 12:]
    j = pl.program_id(1)
    j_first, j_last = j == 0, j == nj - 1
    l_in = xc.shape[-1]
    l_mid = w2.shape[-1]
    wo = w // 2
    th_in = 2 * tho

    x = jnp.concatenate([xt[0, 0], xc[0], xb[0, 0]],
                        axis=0).astype(jnp.float32)       # [th_in+2, W, L]
    if inject:
        # fused TimeMLP prologue: x = silu(x + h); the edge-halo zero rows
        # (the reference's zero padding, applied AFTER the TimeMLP) must
        # stay zero, so re-zero them
        x = _silu(x + tv[0].astype(jnp.float32))
        row0 = jax.lax.broadcasted_iota(jnp.int32, (th_in + 2, 1, 1), 0)
        edge = (j_first & (row0 == 0)) | (j_last & (row0 == th_in + 1))
        x = jnp.where(edge, jnp.zeros_like(x), x)
    zc = jnp.zeros((th_in + 2, 1, l_in), jnp.float32)
    xp = jnp.concatenate([zc, x, zc], axis=1)             # [th_in+2, W+2, L]

    # branch1: stride-2 dw(+BN); its pw is folded into the output matmuls
    u1 = _dw2_9(xp, k1[:], b1[:], tho, wo)                # [tho, wo, L]

    # branch2: pw+SiLU at full res (halo rows included for the dw), edge
    # halo rows re-zeroed (the zero-pad belongs AFTER this pw), then
    # stride-2 dw(+BN)
    t2 = _silu(_mm_rows(x.astype(mm_dtype), w2[:], c2[:]))
    row = jax.lax.broadcasted_iota(jnp.int32, (th_in + 2, 1, 1), 0)
    border = (j_first & (row == 0)) | (j_last & (row == th_in + 1))
    t2 = jnp.where(border, jnp.zeros_like(t2), t2)
    zc2 = jnp.zeros((th_in + 2, 1, l_mid), jnp.float32)
    t2p = jnp.concatenate([zc2, t2, zc2], axis=1)
    u2 = _dw2_9(t2p, k2[:], b2[:], tho, wo)               # [tho, wo, Lmid]

    u1m = u1.astype(mm_dtype)
    u2m = u2.astype(mm_dtype)
    y1 = _silu(_mm_rows(u1m, w1a[:]) + _mm_rows(u2m, w3a[:]) + ca[:])
    y2 = _silu(_mm_rows(u1m, w1b[:]) + _mm_rows(u2m, w3b[:]) + cb[:])
    out1[0] = y1.astype(out1.dtype)
    out2[0] = y2.astype(out2.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_downsample_packed(x: jax.Array, params: Dict[str, jax.Array], *,
                            tvec: jax.Array = None,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Whole ResidualDownsample on a batch-packed input.

    ``x`` [Bp, H, W, L=G*C] (full channels — the downsample does not split);
    ``params`` from fold_downsample_params -> fold_bottleneck_params_packed.
    ``tvec``: optional packed [Bp, 1, L] TimeMLP vector fused as a
    silu(x + h) prologue. Returns the SHUFFLED halves [Bp, H/2, W/2, G*co2].
    """
    bp, h, w, l_in = x.shape
    if h % 2 or w % 2:
        raise ValueError("packed downsample needs even H and W")
    l_out = params["w1a"].shape[-1]
    tho = _pick_tile_packed(h // 2, w, max(l_in, l_out))
    nj = (h // 2) // tho
    xt, xb = _edge_rows(x, 2 * tho)
    core = pl.BlockSpec((1, 2 * tho, w, l_in), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, tho, w // 2, l_out), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, 1, w, l_in), lambda i, j: (i, j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    p = params
    extra_in, extra_specs = [], []
    if tvec is not None:
        extra_in = [tvec]
        extra_specs = [pl.BlockSpec((1, 1, tvec.shape[-1]),
                                    lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
    kern = functools.partial(_packed_down_kernel, tho=tho, w=w, nj=nj,
                             mm_dtype=p["w2"].dtype, inject=tvec is not None)
    y1, y2 = pl.pallas_call(
        kern,
        grid=(bp, nj),
        out_shape=[jax.ShapeDtypeStruct((bp, h // 2, w // 2, l_out),
                                        x.dtype)] * 2,
        in_specs=[core, halo, halo] + extra_specs + [
                  wspec(p["k1"]), wspec(p["b1"]), wspec(p["k2"]),
                  wspec(p["b2"]), wspec(p["w2"]), wspec(p["c2"]),
                  wspec(p["w1a"]), wspec(p["w3a"]), wspec(p["ca"]),
                  wspec(p["w1b"]), wspec(p["w3b"]), wspec(p["cb"])],
        out_specs=[ospec, ospec],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, xt, xb, *extra_in, p["k1"], p["b1"], p["k2"], p["b2"], p["w2"],
      p["c2"], p["w1a"], p["w3a"], p["ca"], p["w1b"], p["w3b"], p["cb"])
    return y1, y2


def packed_downsample(x: jax.Array, raw_params: Dict[str, Any],
                      raw_stats: Dict[str, Any], *, g: int = None,
                      t_vec: jax.Array = None,
                      interpret: bool = False) -> jax.Array:
    """NHWC in -> NHWC out ResidualDownsample through the packed kernel.

    ``t_vec``: optional [B, C] TimeMLP vector fused as a silu(x + h)
    prologue (the encoder block's TimeMLP → downsample without the
    intermediate HBM round trip)."""
    folded = fold_downsample_params(raw_params, raw_stats)
    c = x.shape[-1]
    co2 = folded["w1"].shape[-1]
    if g is None:
        g = pick_group(x.shape[0], c, co2)
    pp = fold_bottleneck_params_packed(folded, g, dtype=x.dtype)
    tvec = None
    if t_vec is not None:
        bp = x.shape[0] // g
        tvec = pack_images(t_vec.reshape(-1, 1, 1, c), g).reshape(bp, 1,
                                                                  g * c)
    y1, y2 = fused_downsample_packed(pack_images(x, g), pp, tvec=tvec,
                                     interpret=interpret)
    return jnp.concatenate([unpack_images(y1, g), unpack_images(y2, g)],
                           axis=-1)


# ---------------------------------------------------------------------------
# Whole-chain kernel (v3): every bottleneck of a stage in ONE pallas launch
# ---------------------------------------------------------------------------
#
# The v2 packed kernel removed layout ops between consecutive units but still
# writes + re-reads the two packed activation halves in HBM once per unit —
# for a 4-unit encoder stage that is 4× (read+write) of activation traffic on
# a chain that is HBM-bound. v3 runs the WHOLE chain inside one kernel:
# activations never leave VMEM between units. Cross-unit halos are handled by
# overlap recompute: each 3×3 depthwise consumes one row of validity per
# side, so a chain of k units needs k extra input rows per side
# (fetched by :func:`_edge_rows_k`, 2k/th duplicated HBM reads — 12.5% at
# th=64, k=4) and the tile computes k garbage rows per side that are simply
# not written back. Out-of-image rows (first/last row tile) are re-zeroed
# before every conv so each unit sees the reference's zero padding.
#
# HBM activation traffic per stage: v2 ≈ k·(R+W); v3 ≈ (1+2k/th)·R + W.


def _dwfull9(xt, k, b, w):
    """Depthwise 3×3 on a full [T, W, L] tile → [T, W, L] (same-size).

    W borders are zero-padded in VMEM (matching the reference's zero pad);
    row borders use a zero pad too, so output rows 0 and T-1 are only valid
    at true image edges — interior tiles treat them as the overlap-recompute
    garbage zone."""
    t, ww, l = xt.shape
    zr = jnp.zeros((1, ww, l), xt.dtype)
    xp = jnp.concatenate([zr, xt, zr], axis=0)            # [T+2, W, L]
    zc = jnp.zeros((t + 2, 1, l), xt.dtype)
    xp = jnp.concatenate([zc, xp, zc], axis=1)            # [T+2, W+2, L]
    acc = xp[0:t, 0:ww, :] * k[0, 0]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            acc = acc + xp[dy:dy + t, dx:dx + ww, :] * k[dy, dx]
    return acc + b


_CHAIN_KEYS = ("k1", "b1", "k2", "b2", "w2", "c2",
               "w1a", "w3a", "ca", "w1b", "w3b", "cb")


def _upsample2x_rows(xs: jax.Array, k: int, t_rows: int) -> jax.Array:
    """2× bilinear row upsample of a small tile (jax.image.resize
    semantics — verified tap weights (0.25, 0.75)/(0.75, 0.25), edge
    clamp supplied by the caller's clamped halo rows).

    ``xs`` [P=th/2+2ks, w, L] covers small rows [j·th/2 − ks, …); returns
    the full-res rows [j·th − k, j·th − k + t_rows) as [t_rows, w, L]."""
    p = xs.shape[0]
    e = 0.25 * xs[0:p - 1] + 0.75 * xs[1:p]   # full row 2(off+q+1)
    o = 0.75 * xs[0:p - 1] + 0.25 * xs[1:p]   # full row 2(off+q)+1
    inter = jnp.concatenate([o[:, None], e[:, None]], axis=1).reshape(
        2 * (p - 1), *xs.shape[1:])            # rows from 2·off + 1
    start = 1 if k % 2 == 0 else 0             # 2ks − k − 1, ks = k//2 + 1
    return inter[start:start + t_rows]


def _upsample2x_cols(x: jax.Array) -> jax.Array:
    """2× bilinear column upsample [T, w, L] → [T, 2w, L] (edge clamp).

    The interleave is a lane-concat + free (W, 2L) → (2W, L) parity
    reshape — Mosaic has no strided scatter but this layout change is a
    no-op reshape."""
    t, w, l = x.shape
    xl = jnp.concatenate([x[:, :1], x[:, :w - 1]], axis=1)
    xr = jnp.concatenate([x[:, 1:], x[:, w - 1:]], axis=1)
    even = 0.25 * xl + 0.75 * x                # full col 2n
    odd = 0.75 * x + 0.25 * xr                 # full col 2n+1
    return jnp.concatenate([even, odd], axis=-1).reshape(t, 2 * w, l)


def _packed_chain_kernel(*refs, th: int, w: int, nj: int, k: int,
                         n_units: int, mm_dtype, inj_idx: int = -1,
                         upsample: bool = False, final: bool = False):
    x1c, x1t, x1b, x2c, x2t, x2b = refs[:6]
    base = 6
    tv1 = tv2 = None
    if inj_idx >= 0:
        tv1, tv2 = refs[base:base + 2]
        base += 2
    wrefs = refs[base:base + 12 * n_units]
    base += 12 * n_units
    if final:
        wfa, wfb, bf = refs[base:base + 3]
        out_f, = refs[base + 3:]
    else:
        out1, out2 = refs[base:]
    j = pl.program_id(1)
    j_first, j_last = j == 0, j == nj - 1
    t_rows = th + 2 * k

    def full(c, t, b):                     # [T, W, L] f32
        return jnp.concatenate([t[0, 0], c[0], b[0, 0]],
                               axis=0).astype(jnp.float32)

    if upsample:
        xs = full(x1c, x1t, x1b)           # [th/2 + 2ks, w/2, L] small rows
        x1 = _upsample2x_cols(_upsample2x_rows(xs, k, t_rows))
    else:
        x1 = full(x1c, x1t, x1b)
    x2 = full(x2c, x2t, x2b)
    row = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 1, 1), 0)
    oob = (j_first & (row < k)) | (j_last & (row >= th + k))

    x1, x2 = _chain_units_body(x1, x2, wrefs, oob, n_units, mm_dtype,
                               inj_idx, tv1, tv2, w)
    if final:
        # fused final 1×1 conv (no activation, reference unet3d.py:176):
        # the full-width stage tensor never reaches HBM — only the
        # few-channel projection does
        y = (_mm_rows(x1.astype(mm_dtype), wfa[:])
             + _mm_rows(x2.astype(mm_dtype), wfb[:]) + bf[:])
        out_f[0] = y[k:k + th].astype(out_f.dtype)
    else:
        out1[0] = x1[k:k + th].astype(out1.dtype)
        out2[0] = x2[k:k + th].astype(out2.dtype)


def _chain_units_body(x1, x2, wrefs, oob, n_units, mm_dtype, inj_idx,
                      tv1, tv2, w):
    """The shared per-unit loop of the whole-chain kernels."""
    for u in range(n_units):
        (k1, b1, k2, b2, w2, c2,
         w1a, w3a, ca, w1b, w3b, cb) = wrefs[12 * u:12 * (u + 1)]
        if u == inj_idx:
            # fused TimeMLP injection: x = silu(x + h), h per (image, chan)
            x1 = _silu(x1 + tv1[0].astype(jnp.float32))
            x2 = _silu(x2 + tv2[0].astype(jnp.float32))
        # out-of-image rows act as the reference's zero padding at EVERY
        # unit (they hold silu(bias) ≠ 0 after the previous unit's pw)
        x1 = jnp.where(oob, jnp.zeros_like(x1), x1)
        x2 = jnp.where(oob, jnp.zeros_like(x2), x2)
        u1 = _dwfull9(x1, k1[:], b1[:], w)
        t2 = _silu(_mm_rows(x2.astype(mm_dtype), w2[:], c2[:]))
        t2 = jnp.where(oob, jnp.zeros_like(t2), t2)   # ref pads AFTER this pw
        u2 = _dwfull9(t2, k2[:], b2[:], w)
        u1m = u1.astype(mm_dtype)
        u2m = u2.astype(mm_dtype)
        x1 = _silu(_mm_rows(u1m, w1a[:]) + _mm_rows(u2m, w3a[:]) + ca[:])
        x2 = _silu(_mm_rows(u1m, w1b[:]) + _mm_rows(u2m, w3b[:]) + cb[:])
    return x1, x2


def _edge_rows_k(x: jax.Array, th: int, k: int, clamp: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    """k-row halos per tile: top_j = rows [j·th−k, j·th), bot_j = rows
    [(j+1)·th, (j+1)·th+k) as [Bp, nj, k, W, L]; image edges are zero-padded
    (conv padding) or edge-clamped (``clamp=True``, bilinear-resize
    semantics)."""
    bp, h, w, l = x.shape
    nj = h // th
    if clamp:
        zt = jnp.repeat(x[:, :1], k, axis=1)
        zb = jnp.repeat(x[:, h - 1:], k, axis=1)
    else:
        zt = zb = jnp.zeros((bp, k, w, l), x.dtype)
    xt = jnp.concatenate([zt, x], axis=1)
    top = jnp.stack([xt[:, i:i + nj * th:th] for i in range(k)], axis=2)
    xb = jnp.concatenate([x, zb], axis=1)
    bot = jnp.stack([xb[:, th + i::th][:, :nj] for i in range(k)], axis=2)
    return top, bot


def _pick_tile_chain(h: int, w: int, l: int, k: int, even: bool = False):
    """Largest row tile with ~<=4 MB per f32 working array; None = no fit
    (caller falls back to the per-unit chain). ``even``: only even tiles
    (the fused-upsample variant maps each tile onto th/2 half-res rows)."""
    budget = 4.0 * 2 ** 20 / 4
    for t in sorted((d for d in range(1, min(h, 256) + 1) if h % d == 0),
                    reverse=True):
        if t < k or (even and t % 2):
            continue
        if (t + 2 * k + 2) * (w + 2) * l <= budget:
            return t
    return None


@functools.partial(jax.jit,
                   static_argnames=("interpret", "inj_idx", "upsample"))
def fused_chain_whole(x1: jax.Array, x2: jax.Array, packed_units, *,
                      tvecs=None, inj_idx: int = -1,
                      upsample: bool = False, final_packed=None,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Run a whole chain of packed bottleneck units in ONE pallas launch.

    ``x1``/``x2`` [Bp, H, W, L] packed branch halves; ``packed_units`` a
    list/tuple of :func:`fold_bottleneck_params_packed` dicts. Activations
    stay in VMEM across units (overlap recompute, k = len(units) halo rows).
    ``tvecs``/``inj_idx``: optional fused TimeMLP injection — a pair of
    packed [Bp, 1, L] per-(image, channel) vectors applied as
    x = silu(x + h) immediately before unit ``inj_idx`` (the reference's
    additive TimeMLP between stage units, unet3d.py:74-88).
    ``upsample``: ``x1`` is the HALF-resolution [Bp, H/2, W/2, L] branch —
    the decoder's 2× bilinear upsample runs in VMEM (the up|skip concat IS
    the branch split, reference unet3d.py:107-125), reading a quarter of
    the bytes instead of resize(R+4W) + chain read.
    """
    packed_units = list(packed_units)
    n = len(packed_units)
    bp, h, w, l_in = x2.shape if upsample else x1.shape
    l_out = packed_units[-1]["w1a"].shape[-1]
    l_max = max([l_in] + [u["w1a"].shape[-1] for u in packed_units])
    th = _pick_tile_chain(h, w, l_max, n, even=upsample)
    if th is None:
        raise ValueError("no VMEM-feasible row tile for this chain")
    nj = h // th
    if upsample:
        ks = n // 2 + 1
        x1t, x1b = _edge_rows_k(x1, th // 2, ks, clamp=True)
        spec1 = pl.BlockSpec((1, th // 2, w // 2, l_in),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
        halo1 = pl.BlockSpec((1, 1, ks, w // 2, l_in),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        x1t, x1b = _edge_rows_k(x1, th, n)
    core = lambda l: pl.BlockSpec((1, th, w, l), lambda i, j: (i, j, 0, 0),
                                  memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, n, w, l_in), lambda i, j: (i, j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    if not upsample:
        spec1, halo1 = core(l_in), halo
    x2t, x2b = _edge_rows_k(x2, th, n)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    extra_in, extra_specs = [], []
    if inj_idx >= 0:
        tv1, tv2 = tvecs
        tvspec = pl.BlockSpec((1, 1, tv1.shape[-1]), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        extra_in, extra_specs = [tv1, tv2], [tvspec, tvspec]
    weights = [u[key] for u in packed_units for key in _CHAIN_KEYS]
    final = final_packed is not None
    if final:
        weights += list(final_packed)          # wfa, wfb, bf
        l_f = final_packed[0].shape[-1]
        out_shapes = [jax.ShapeDtypeStruct((bp, h, w, l_f), x1.dtype)]
        out_specs = [core(l_f)]
    else:
        out_shapes = [jax.ShapeDtypeStruct((bp, h, w, l_out), x1.dtype)] * 2
        out_specs = [core(l_out), core(l_out)]
    kern = functools.partial(_packed_chain_kernel, th=th, w=w, nj=nj, k=n,
                             n_units=n, mm_dtype=packed_units[0]["w2"].dtype,
                             inj_idx=inj_idx, upsample=upsample, final=final)
    out = pl.pallas_call(
        kern,
        grid=(bp, nj),
        out_shape=out_shapes,
        in_specs=[spec1, halo1, halo1, core(l_in), halo, halo]
        + extra_specs + [wspec(a) for a in weights],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x1, x1t, x1b, x2, x2t, x2b, *extra_in, *weights)
    return out[0] if final else out


def fold_final_conv_packed(fk: jax.Array, fb, g: int, dtype
                           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Final 1×1 conv [1,1,C,out] (or [C,out]) → row-split halves,
    block-diagonal packed (wfa, wfb, bf) for the chain kernels' fused
    epilogue."""
    if fk.ndim == 4:
        fk = fk[0, 0]
    cc, out = fk.shape
    half = cc // 2
    eye = jnp.eye(g, dtype=jnp.float32)

    def bd(wm):
        return jnp.einsum("gh,ab->gahb", eye,
                          wm.astype(jnp.float32)).reshape(
            g * wm.shape[0], g * wm.shape[1])

    bfv = jnp.broadcast_to(jnp.asarray(fb, jnp.float32).reshape(-1), (out,))
    return (bd(fk[:half]).astype(dtype), bd(fk[half:]).astype(dtype),
            jnp.concatenate([bfv.reshape(1, -1)] * g, axis=-1))


def _final_xla(y: jax.Array, final_proj) -> jax.Array:
    fk, fb = final_proj
    if fk.ndim == 4:
        fk = fk[0, 0]
    return jnp.einsum("bhwc,co->bhwo", y.astype(fk.dtype), fk) + fb


def packed_bottleneck_chain_whole(x: jax.Array, units, *, g: int = None,
                                  t_vec: jax.Array = None,
                                  inj_after: int = None,
                                  final_proj=None,
                                  interpret: bool = False) -> jax.Array:
    """:func:`packed_bottleneck_chain` fused into a single kernel launch.

    ``t_vec``/``inj_after``: optional [B, C] TimeMLP vector applied as
    x = silu(x + h) between units ``inj_after - 1`` and ``inj_after``
    (fused in-kernel — the decoder block's chain4 → TimeMLP → chain1
    becomes ONE launch). Falls back to the per-unit packed chain when the
    whole chain does not fit a VMEM row tile (huge W×L)."""
    ch = x.shape[-1] // 2
    if g is None:
        g, c = 128, ch
        for u in units:
            co2 = u["w1"].shape[-1]
            g = min(g, pick_group(x.shape[0], c, co2))
            c = co2
    inj_idx = -1 if t_vec is None else int(inj_after)
    widths = [g * ch] + [g * u["w1"].shape[-1] for u in units]
    if _pick_tile_chain(x.shape[1], x.shape[2], max(widths),
                        len(units)) is None:
        if t_vec is None:
            y = packed_bottleneck_chain(x, units, g=g, interpret=interpret)
        else:
            y = packed_bottleneck_chain(x, units[:inj_idx], g=g,
                                        interpret=interpret)
            y = _silu(y + t_vec[:, None, None, :].astype(y.dtype))
            y = packed_bottleneck_chain(y, units[inj_idx:], g=g,
                                        interpret=interpret)
        return y if final_proj is None else _final_xla(y, final_proj)
    packed = tuple(u if "w1a" in u else fold_bottleneck_params_packed(
        u, g, dtype=x.dtype) for u in units)
    x1 = pack_images(x[..., :ch], g)
    x2 = pack_images(x[..., ch:], g)
    tvecs = None
    if inj_idx >= 0:
        ci = t_vec.shape[-1] // 2
        bp = x.shape[0] // g
        tvecs = tuple(
            pack_images(v.reshape(-1, 1, 1, ci), g).reshape(bp, 1, g * ci)
            for v in (t_vec[:, :ci], t_vec[:, ci:]))
    fp = None if final_proj is None else fold_final_conv_packed(
        final_proj[0], final_proj[1], g, x.dtype)
    out = fused_chain_whole(x1, x2, packed, tvecs=tvecs, inj_idx=inj_idx,
                            final_packed=fp, interpret=interpret)
    if final_proj is not None:
        return unpack_images(out, g)
    y1, y2 = out
    return jnp.concatenate([unpack_images(y1, g), unpack_images(y2, g)],
                           axis=-1)


# ---------------------------------------------------------------------------
# Whole-EncoderBlock kernel: chain4 → shortcut → TimeMLP → stride-2 downsample
# ---------------------------------------------------------------------------
#
# The encoder block previously ran as two launches (whole-chain kernel, then
# the packed downsample) with the full-res stage tensor written, re-laid-out
# (unpack→concat→pack, the two kernels use different group packings) and
# re-read in between. Fused, the stage tensor leaves VMEM exactly once — as
# the decoder shortcut the skip connection needs anyway — and the downsample
# consumes it in-register. One group G (the chain's) serves both parts: the
# downsample's full-C tensors split exactly into the two chain halves
# (depthwise = per-channel; pointwise = row-split of the weight matrix), at
# the cost of mid-tensor lanes up to 2×128 (legal, extra vregs) and G× zero
# blocks in the block-diagonal matmuls (FLOP waste on an HBM-bound op).

_DOWN_SPLIT_KEYS = ("k1a", "b1a", "k1b", "b1b", "k2", "b2", "w2a", "w2b",
                    "c2", "w1aa", "w1ab", "w3a", "ca", "w1ba", "w1bb",
                    "w3b", "cb")


def fold_downsample_params_packed_split(folded: Dict[str, jax.Array], g: int,
                                        dtype=jnp.bfloat16
                                        ) -> Dict[str, jax.Array]:
    """:func:`fold_downsample_params` dict → packed tensors for the
    encoder-block kernel, every full-C input tensor split into the two
    chain halves (stage channels [0, C/2) / [C/2, C) — exactly the packed
    y1/y2 the chain carries)."""
    cc = folded["k1"].shape[-1]
    co2 = folded["w1"].shape[-1]
    if co2 % 2:
        raise ValueError("packed kernel needs even per-branch width")
    half = cc // 2
    eye = jnp.eye(g, dtype=jnp.float32)

    def tile_lane(v):
        return jnp.concatenate([v] * g, axis=-1)

    def blockdiag(wm):
        return jnp.einsum("gh,ab->gahb", eye,
                          wm.astype(jnp.float32)).reshape(
            g * wm.shape[0], g * wm.shape[1])

    # channel-shuffle interleave of the two output pointwise convs (same
    # scheme as fold_bottleneck_params_packed)
    w1 = folded["w1"].astype(jnp.float32)
    w3 = folded["w3"].astype(jnp.float32)
    c1 = folded["c1"].reshape(-1).astype(jnp.float32)
    c3 = folded["c3"].reshape(-1).astype(jnp.float32)
    h2 = co2 // 2
    w1a = jnp.zeros((cc, co2), jnp.float32).at[:, 0::2].set(w1[:, :h2])
    w3a = jnp.zeros((w3.shape[0], co2),
                    jnp.float32).at[:, 1::2].set(w3[:, :h2])
    w1b = jnp.zeros((cc, co2), jnp.float32).at[:, 0::2].set(w1[:, h2:])
    w3b = jnp.zeros((w3.shape[0], co2),
                    jnp.float32).at[:, 1::2].set(w3[:, h2:])
    ca = jnp.zeros((co2,), jnp.float32).at[0::2].set(
        c1[:h2]).at[1::2].set(c3[:h2])
    cb = jnp.zeros((co2,), jnp.float32).at[0::2].set(
        c1[h2:]).at[1::2].set(c3[h2:])
    out = {
        "k1a": tile_lane(folded["k1"][..., :half]).astype(dtype),
        "b1a": tile_lane(folded["b1"].reshape(1, -1)[:, :half]),
        "k1b": tile_lane(folded["k1"][..., half:]).astype(dtype),
        "b1b": tile_lane(folded["b1"].reshape(1, -1)[:, half:]),
        "k2": tile_lane(folded["k2"]).astype(dtype),
        "b2": tile_lane(folded["b2"].reshape(1, -1)),
        "w2a": blockdiag(folded["w2"][:half]).astype(dtype),
        "w2b": blockdiag(folded["w2"][half:]).astype(dtype),
        "c2": tile_lane(folded["c2"].reshape(1, -1)),
        "w1aa": blockdiag(w1a[:half]).astype(dtype),
        "w1ab": blockdiag(w1a[half:]).astype(dtype),
        "w3a": blockdiag(w3a).astype(dtype),
        "ca": tile_lane(ca.reshape(1, -1)),
        "w1ba": blockdiag(w1b[:half]).astype(dtype),
        "w1bb": blockdiag(w1b[half:]).astype(dtype),
        "w3b": blockdiag(w3b).astype(dtype),
        "cb": tile_lane(cb.reshape(1, -1)),
    }
    for kk in ("b1a", "b1b", "b2", "c2", "ca", "cb"):
        out[kk] = out[kk].astype(jnp.float32)
    return out


def _packed_enc_block_kernel(*refs, th: int, w: int, nj: int, n_units: int,
                             mm_dtype, inject: bool = False,
                             init: bool = False):
    k = n_units + 1 + (1 if init else 0)
    if init:
        xrc, xrt, xrb = refs[:3]
        base = 3
        wia, wib, bia, bib = refs[base:base + 4]
        base += 4
    else:
        x1c, x1t, x1b, x2c, x2t, x2b = refs[:6]
        base = 6
    tv1 = tv2 = None
    if inject:
        tv1, tv2 = refs[base:base + 2]
        base += 2
    wrefs = refs[base:base + 12 * n_units]
    base += 12 * n_units
    (k1a, b1a, k1b, b1b, k2d, b2d, w2a, w2b, c2d,
     w1aa, w1ab, w3a, ca, w1ba, w1bb, w3b, cb) = refs[base:base + 17]
    s1o, s2o, d1o, d2o = refs[base + 17:]
    j = pl.program_id(1)
    j_first, j_last = j == 0, j == nj - 1
    t_rows = th + 2 * k

    def full(c, t, b):
        return jnp.concatenate([t[0, 0], c[0], b[0, 0]],
                               axis=0).astype(jnp.float32)

    if init:
        # fused init ConvBnSiLu (3×3 dense, reference unet3d.py:148): the
        # raw image is the kernel input; the two branch halves are produced
        # directly by column-split taps (wia/wib), so the full-width tensor
        # never exists in HBM
        xr = full(xrc, xrt, xrb)               # [T, W, g·Cin]
        t_, ww, li = xr.shape
        zr = jnp.zeros((1, ww, li), xr.dtype)
        xp = jnp.concatenate([zr, xr, zr], axis=0)
        zc = jnp.zeros((t_ + 2, 1, li), xr.dtype)
        xp = jnp.concatenate([zc, xp, zc], axis=1)
        acc1 = acc2 = None
        for dy in range(3):
            for dx in range(3):
                tap = xp[dy:dy + t_, dx:dx + ww].astype(mm_dtype)
                a1 = _mm_rows(tap, wia[3 * dy + dx])
                a2 = _mm_rows(tap, wib[3 * dy + dx])
                acc1 = a1 if acc1 is None else acc1 + a1
                acc2 = a2 if acc2 is None else acc2 + a2
        x1 = _silu(acc1 + bia[:])
        x2 = _silu(acc2 + bib[:])
    else:
        x1 = full(x1c, x1t, x1b)
        x2 = full(x2c, x2t, x2b)
    row = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 1, 1), 0)
    oob = (j_first & (row < k)) | (j_last & (row >= th + k))
    x1, x2 = _chain_units_body(x1, x2, wrefs, oob, n_units, mm_dtype,
                               -1, None, None, w)

    # the stage output leaves VMEM exactly once: as the decoder shortcut
    s1o[0] = x1[k:k + th].astype(s1o.dtype)
    s2o[0] = x2[k:k + th].astype(s2o.dtype)

    if inject:  # TimeMLP between shortcut and downsample (unet3d.py:139-142)
        x1 = _silu(x1 + tv1[0].astype(jnp.float32))
        x2 = _silu(x2 + tv2[0].astype(jnp.float32))
    x1 = jnp.where(oob, jnp.zeros_like(x1), x1)
    x2 = jnp.where(oob, jnp.zeros_like(x2), x2)

    # stride-2 ResidualDownsample on the valid [k−1, k+th+1) window
    tho, wo = th // 2, w // 2
    xin1 = x1[k - 1:k + th + 1]
    xin2 = x2[k - 1:k + th + 1]
    zc = jnp.zeros((th + 2, 1, xin1.shape[-1]), jnp.float32)
    u1_1 = _dw2_9(jnp.concatenate([zc, xin1, zc], axis=1),
                  k1a[:], b1a[:], tho, wo)
    u1_2 = _dw2_9(jnp.concatenate([zc, xin2, zc], axis=1),
                  k1b[:], b1b[:], tho, wo)
    t2 = _silu(_mm_rows(xin1.astype(mm_dtype), w2a[:])
               + _mm_rows(xin2.astype(mm_dtype), w2b[:]) + c2d[:])
    row2 = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    border = (j_first & (row2 == 0)) | (j_last & (row2 == th + 1))
    t2 = jnp.where(border, jnp.zeros_like(t2), t2)
    zc2 = jnp.zeros((th + 2, 1, t2.shape[-1]), jnp.float32)
    u2 = _dw2_9(jnp.concatenate([zc2, t2, zc2], axis=1),
                k2d[:], b2d[:], tho, wo)
    u11, u12 = u1_1.astype(mm_dtype), u1_2.astype(mm_dtype)
    u2m = u2.astype(mm_dtype)
    y1 = _silu(_mm_rows(u11, w1aa[:]) + _mm_rows(u12, w1ab[:])
               + _mm_rows(u2m, w3a[:]) + ca[:])
    y2 = _silu(_mm_rows(u11, w1ba[:]) + _mm_rows(u12, w1bb[:])
               + _mm_rows(u2m, w3b[:]) + cb[:])
    d1o[0] = y1.astype(d1o.dtype)
    d2o[0] = y2.astype(d2o.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "inject"))
def fused_encoder_block(x1: jax.Array, x2, packed_units,
                        down_packed, *, tvecs=None, inject: bool = False,
                        init_packed=None, interpret: bool = False):
    """Whole EncoderBlock on packed halves: returns (s1, s2, d1, d2) —
    the full-res stage/shortcut halves and the downsampled halves.
    With ``init_packed`` (wia, wib, bia, bib), ``x1`` is the packed RAW
    image and the init ConvBnSiLu runs as the kernel prologue (x2 unused).
    """
    packed_units = list(packed_units)
    n = len(packed_units)
    init = init_packed is not None
    k = n + 1 + (1 if init else 0)
    bp, h, w, l_in = x1.shape
    l_s = packed_units[-1]["w1a"].shape[-1]
    l_d = down_packed["w1aa"].shape[-1]
    # include unit 0's input width (w2's row count) — with the init
    # prologue l_in is the tiny raw-image lane count, not the chain width
    l_max = max([l_in, l_d, down_packed["w2a"].shape[-1],
                 packed_units[0]["w2"].shape[0]]
                + [u["w1a"].shape[-1] for u in packed_units])
    th = _pick_tile_chain(h, w, l_max, k, even=True)
    if th is None:
        raise ValueError("no VMEM-feasible even row tile for this block")
    nj = h // th
    x1t, x1b = _edge_rows_k(x1, th, k)
    core = lambda l: pl.BlockSpec((1, th, w, l), lambda i, j: (i, j, 0, 0),
                                  memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, k, w, l_in), lambda i, j: (i, j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, th // 2, w // 2, l_d),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    if init:
        inputs = [x1, x1t, x1b]
        in_specs = [core(l_in), halo, halo]
        inputs += list(init_packed)
        in_specs += [wspec(a) for a in init_packed]
    else:
        x2t, x2b = _edge_rows_k(x2, th, k)
        inputs = [x1, x1t, x1b, x2, x2t, x2b]
        in_specs = [core(l_in), halo, halo, core(l_in), halo, halo]
    if inject:
        tv1, tv2 = tvecs
        tvspec = pl.BlockSpec((1, 1, tv1.shape[-1]), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        inputs += [tv1, tv2]
        in_specs += [tvspec, tvspec]
    weights = ([u[key] for u in packed_units for key in _CHAIN_KEYS]
               + [down_packed[key] for key in _DOWN_SPLIT_KEYS])
    kern = functools.partial(_packed_enc_block_kernel, th=th, w=w, nj=nj,
                             n_units=n,
                             mm_dtype=packed_units[0]["w2"].dtype,
                             inject=inject, init=init)
    return pl.pallas_call(
        kern,
        grid=(bp, nj),
        out_shape=[jax.ShapeDtypeStruct((bp, h, w, l_s), x1.dtype)] * 2
        + [jax.ShapeDtypeStruct((bp, h // 2, w // 2, l_d), x1.dtype)] * 2,
        in_specs=in_specs + [wspec(a) for a in weights],
        out_specs=[core(l_s), core(l_s), dspec, dspec],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *weights)


def fold_init_conv_packed(ki: jax.Array, bi, g: int, dtype
                          ) -> Tuple[jax.Array, ...]:
    """BN-folded init conv [3,3,Cin,C] → per-tap column-split block-diag
    (wia, wib [9, g·Cin, g·C/2]) + lane-tiled bias halves, so the kernel
    prologue produces the two branch halves directly."""
    cc = ki.shape[3]
    half = cc // 2
    eye = jnp.eye(g, dtype=jnp.float32)

    def bd(wm):
        return jnp.einsum("gh,ab->gahb", eye,
                          wm.astype(jnp.float32)).reshape(
            g * wm.shape[0], g * wm.shape[1])

    wia = jnp.stack([bd(ki[dy, dx][:, :half])
                     for dy in range(3) for dx in range(3)])
    wib = jnp.stack([bd(ki[dy, dx][:, half:])
                     for dy in range(3) for dx in range(3)])
    biv = jnp.asarray(bi, jnp.float32).reshape(-1)
    bia = jnp.concatenate([biv[:half].reshape(1, -1)] * g, axis=-1)
    bib = jnp.concatenate([biv[half:].reshape(1, -1)] * g, axis=-1)
    return wia.astype(dtype), wib.astype(dtype), bia, bib


def _init_conv_xla(x: jax.Array, ki: jax.Array, bi) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, ki.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _silu(y + jnp.asarray(bi, x.dtype).reshape(-1))


def packed_encoder_block(x: jax.Array, units, down_raw: Dict[str, Any],
                         down_stats: Dict[str, Any], *,
                         t_vec: jax.Array = None, g: int = None,
                         init_conv=None,
                         interpret: bool = False
                         ) -> Tuple[jax.Array, jax.Array]:
    """Whole EncoderBlock (reference unet3d.py:127-144) in ONE launch:
    4-unit chain → shortcut emit → TimeMLP → stride-2 downsample.

    Returns ``(shortcut, downsampled)`` NHWC. Requires even H/W (caller
    guards, as for :func:`packed_downsample`); falls back to the
    two-launch path when no even VMEM row tile fits. With
    ``init_conv=(ki, bi)`` (BN-folded [3,3,Cin,C] + bias), ``x`` is the
    RAW image and the init ConvBnSiLu runs as the kernel prologue."""
    ch = (init_conv[0].shape[3] if init_conv is not None
          else x.shape[-1]) // 2
    b, hh, ww, _ = x.shape
    if g is None:
        g, c = 128, ch
        for u in units:
            co2 = u["w1"].shape[-1]
            g = min(g, pick_group(b, c, co2))
            c = co2
    folded_d = fold_downsample_params(down_raw, down_stats)
    widths = ([g * ch] + [g * u["w1"].shape[-1] for u in units]
              + [g * folded_d["w2"].shape[-1], g * folded_d["w1"].shape[-1]])
    k = len(units) + 1 + (1 if init_conv is not None else 0)
    th = _pick_tile_chain(hh, ww, max(widths), k, even=True)
    if th is None:
        if init_conv is not None:
            x = _init_conv_xla(x, *init_conv)
        sc = packed_bottleneck_chain_whole(x, units, g=g,
                                           interpret=interpret)
        return sc, packed_downsample(sc, down_raw, down_stats, t_vec=t_vec,
                                     interpret=interpret)
    packed = tuple(u if "w1a" in u else fold_bottleneck_params_packed(
        u, g, dtype=x.dtype) for u in units)
    pd = fold_downsample_params_packed_split(folded_d, g, dtype=x.dtype)
    init_packed = None
    if init_conv is not None:
        init_packed = fold_init_conv_packed(init_conv[0], init_conv[1], g,
                                            x.dtype)
        x1, x2 = pack_images(x, g), None
    else:
        x1 = pack_images(x[..., :ch], g)
        x2 = pack_images(x[..., ch:], g)
    tvecs = None
    if t_vec is not None:
        ci = t_vec.shape[-1] // 2
        bp = b // g
        tvecs = tuple(
            pack_images(v.reshape(-1, 1, 1, ci), g).reshape(bp, 1, g * ci)
            for v in (t_vec[:, :ci], t_vec[:, ci:]))
    s1, s2, d1, d2 = fused_encoder_block(x1, x2, packed, pd, tvecs=tvecs,
                                         inject=t_vec is not None,
                                         init_packed=init_packed,
                                         interpret=interpret)
    sc = jnp.concatenate([unpack_images(s1, g), unpack_images(s2, g)],
                         axis=-1)
    down = jnp.concatenate([unpack_images(d1, g), unpack_images(d2, g)],
                           axis=-1)
    return sc, down


def packed_bottleneck_chain_whole_up(x_small: jax.Array, skip: jax.Array,
                                     units, *, g: int = None,
                                     t_vec: jax.Array = None,
                                     inj_after: int = None,
                                     final_proj=None,
                                     interpret: bool = False) -> jax.Array:
    """Decoder-block chain with the 2× bilinear upsample fused in-kernel.

    The decoder concatenates upsample(x) with the encoder shortcut and the
    first bottleneck splits that concat in half — and the two halves ARE
    (upsample(x), shortcut) since both carry the same channel count
    (reference unet3d.py:107-125). So the kernel reads the HALF-resolution
    ``x_small`` [B, h, w, C] directly (quarter the bytes) and upsamples in
    VMEM; ``skip`` [B, 2h, 2w, C] is the full-res branch. Non-2× grids and
    VMEM-infeasible tiles fall back to XLA resize + the fused chain."""
    ch = x_small.shape[-1]
    b, hs, ws, _ = x_small.shape
    hh, ww = skip.shape[1], skip.shape[2]
    if g is None:
        g, c = 128, ch
        for u in units:
            co2 = u["w1"].shape[-1]
            g = min(g, pick_group(b, c, co2))
            c = co2
    widths = [g * ch] + [g * u["w1"].shape[-1] for u in units]
    th = _pick_tile_chain(hh, ww, max(widths), len(units), even=True)
    if hh != 2 * hs or ww != 2 * ws or skip.shape[-1] != ch or th is None:
        up = jax.image.resize(x_small, (b, hh, ww, ch), method="bilinear")
        x = jnp.concatenate([up, skip], axis=-1)
        return packed_bottleneck_chain_whole(x, units, g=g, t_vec=t_vec,
                                             inj_after=inj_after,
                                             final_proj=final_proj,
                                             interpret=interpret)
    inj_idx = -1 if t_vec is None else int(inj_after)
    packed = tuple(u if "w1a" in u else fold_bottleneck_params_packed(
        u, g, dtype=skip.dtype) for u in units)
    x1 = pack_images(x_small, g)
    x2 = pack_images(skip, g)
    tvecs = None
    if inj_idx >= 0:
        ci = t_vec.shape[-1] // 2
        bp = b // g
        tvecs = tuple(
            pack_images(v.reshape(-1, 1, 1, ci), g).reshape(bp, 1, g * ci)
            for v in (t_vec[:, :ci], t_vec[:, ci:]))
    fp = None if final_proj is None else fold_final_conv_packed(
        final_proj[0], final_proj[1], g, skip.dtype)
    out = fused_chain_whole(x1, x2, packed, tvecs=tvecs, inj_idx=inj_idx,
                            upsample=True, final_packed=fp,
                            interpret=interpret)
    if final_proj is not None:
        return unpack_images(out, g)
    y1, y2 = out
    return jnp.concatenate([unpack_images(y1, g), unpack_images(y2, g)],
                           axis=-1)


def reference_bottleneck(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """Plain-XLA executable spec of the fused kernel (used by tests and as a
    CPU fallback): identical math, unfused."""
    ch = x.shape[-1] // 2
    x1, x2 = x[..., :ch], x[..., ch:]
    xp1 = jnp.pad(x1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    t1 = sum(xp1[:, dy:dy + x.shape[1], dx:dx + x.shape[2], :] * p["k1"][dy, dx]
             for dy in range(3) for dx in range(3)) + p["b1"]
    t1 = _silu(jnp.einsum("bhwc,cd->bhwd", t1, p["w1"],
                          preferred_element_type=jnp.float32)
               + p["c1"]).astype(x.dtype)
    t2 = _silu(jnp.einsum("bhwc,cd->bhwd", x2, p["w2"],
                          preferred_element_type=jnp.float32)
               + p["c2"]).astype(x.dtype)
    tp2 = jnp.pad(t2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    t2 = sum(tp2[:, dy:dy + x.shape[1], dx:dx + x.shape[2], :] * p["k2"][dy, dx]
             for dy in range(3) for dx in range(3)) + p["b2"]
    t2 = _silu(jnp.einsum("bhwc,cd->bhwd", t2, p["w3"],
                          preferred_element_type=jnp.float32)
               + p["c3"]).astype(x.dtype)
    return jnp.stack([t1, t2], axis=-1).reshape(
        x.shape[0], x.shape[1], x.shape[2], -1)
