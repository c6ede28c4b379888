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
