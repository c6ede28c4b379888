"""Reference (torch) checkpoint → this framework's flax pytrees.

The reference saves raw ``state_dict`` flavors per worker (SURVEY §5):
``vqvae.state_dict()`` + a separate discriminator file
(vqganVqvaeWorker.py:471-477), ``{'vae_state_dict', 'optimizer_state_dict'}``
(vaeWorker.py:246-249), the bare minGPT ``transformer.state_dict()``
(vqTransformerWorker.py:231), ``{'diffusion','optimizer','scheduler'}``
(vqdiffusionWorker.py:243-248), ``{'model','opt','ema',...}``
(gaussianDiffusion2DWorker.py:164-172) and ``{'model','model_ema'}``
(gaussianDiffusion3DWorker.py:136-137).

This module converts each flavor into the matching flax parameter pytree so a
user migrating from the reference can carry their trained weights over
(``tools/import_torch_checkpoint.py`` wraps it into a resume-able Orbax
checkpoint).

Design: conversion is **key-driven** — it walks ``state_dict`` key prefixes
and replicates the reference modules' construction-order arithmetic
(e.g. encoder.py:43-97's Sequential layout), so it needs neither torch module
classes nor the reference repo on ``sys.path``; only the tensor dict.
Every converter runs over a consumption-tracking view and raises if any
parameter key was left unmapped — mapping drift fails loudly instead of
silently dropping weights. Layout changes torch→flax: Conv2d OIHW→HWIO,
Conv1d OIK→KIO, Linear [O,I]→[I,O]; NCHW modules become our NHWC modules.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

__all__ = [
    "convert_vqvae", "convert_vae", "convert_discriminator", "convert_gpt",
    "convert_shuffle_unet", "convert_unet1d", "convert_discrete_diffusion",
]


class _SD:
    """Consumption-tracking view over a flat ``{key: ndarray}`` state_dict."""

    #: buffer suffixes that are recomputed on our side rather than imported
    _IGNORED_SUFFIXES = ("num_batches_tracked",)

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"state_dict key {key!r} not found — wrong geometry/config "
                f"for this checkpoint? (nearest: "
                f"{[k for k in self.sd if k.split('.')[0] == key.split('.')[0]][:4]})")
        self.used.add(key)
        return self.sd[key]

    def has(self, prefix: str) -> bool:
        return prefix in self.sd or any(
            k.startswith(prefix + ".") for k in self.sd)

    def skip(self, key: str) -> None:
        if key in self.sd:
            self.used.add(key)

    def max_index(self, prefix: str) -> int:
        """Largest integer i such that some key starts with ``prefix.i.``."""
        best = -1
        plen = len(prefix) + 1
        for k in self.sd:
            if k.startswith(prefix + "."):
                head = k[plen:].split(".", 1)[0]
                if head.isdigit():
                    best = max(best, int(head))
        return best

    def assert_consumed(self, scope: str = "") -> None:
        leftover = [
            k for k in self.sd
            if k not in self.used
            and (not scope or k == scope or k.startswith(scope + "."))
            and not k.endswith(self._IGNORED_SUFFIXES)
        ]
        if leftover:
            raise ValueError(
                f"unconverted state_dict keys (mapping drift): {leftover[:8]}"
                + (f" … +{len(leftover) - 8}" if len(leftover) > 8 else ""))


# ---------------------------------------------------------------------------
# leaf converters (torch layouts → flax layouts)
# ---------------------------------------------------------------------------

def _conv2d(sd: _SD, p: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd.take(f"{p}.weight"), (2, 3, 1, 0))}
    if f"{p}.bias" in sd.sd:
        out["bias"] = sd.take(f"{p}.bias")
    return out


def _conv1d(sd: _SD, p: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd.take(f"{p}.weight"), (2, 1, 0))}
    if f"{p}.bias" in sd.sd:
        out["bias"] = sd.take(f"{p}.bias")
    return out


def _dense(sd: _SD, p: str) -> Dict[str, np.ndarray]:
    out = {"kernel": sd.take(f"{p}.weight").T}
    if f"{p}.bias" in sd.sd:
        out["bias"] = sd.take(f"{p}.bias")
    return out


def _ln(sd: _SD, p: str) -> Dict[str, np.ndarray]:
    return {"scale": sd.take(f"{p}.weight"), "bias": sd.take(f"{p}.bias")}


def _gn(sd: _SD, p: str) -> Dict[str, Any]:
    # reference GroupNorm wrapper holds the real norm at .group_norm
    # (common/blocks.py:25-44); our blocks name it GroupNorm_0.
    return {"GroupNorm_0": {"scale": sd.take(f"{p}.group_norm.weight"),
                            "bias": sd.take(f"{p}.group_norm.bias")}}


def _bn(sd: _SD, p: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": sd.take(f"{p}.weight"), "bias": sd.take(f"{p}.bias")}
    stats = {"mean": sd.take(f"{p}.running_mean"),
             "var": sd.take(f"{p}.running_var")}
    return params, stats


# ---------------------------------------------------------------------------
# VQVAE / VAE encoder+decoder (reference encoder.py:43-97, decoder.py:50-99)
# ---------------------------------------------------------------------------

def _res_block(sd: _SD, p: str) -> Dict[str, Any]:
    # ResidualBlock.block = [GN, Swish, conv, GN, Swish, Dropout, conv];
    # conv_shortcut exists only when in_channels != out_channels
    # (common/blocks.py:78-86) — detectable from the keys alone.
    out = {"GroupNorm_0": _gn(sd, f"{p}.block.0"),
           "conv1": _conv2d(sd, f"{p}.block.2"),
           "GroupNorm_1": _gn(sd, f"{p}.block.3"),
           "conv2": _conv2d(sd, f"{p}.block.6")}
    if sd.has(f"{p}.conv_shortcut"):
        out["shortcut"] = _conv2d(sd, f"{p}.conv_shortcut")
    return out


def _attn_block(sd: _SD, p: str) -> Dict[str, Any]:
    return {"GroupNorm_0": _gn(sd, f"{p}.norm"),
            "q": _conv2d(sd, f"{p}.q"), "k": _conv2d(sd, f"{p}.k"),
            "v": _conv2d(sd, f"{p}.v"),
            "proj_out": _conv2d(sd, f"{p}.project_out")}


def _encoder(sd: _SD, root: str, *, img_size: int, interm: Sequence[int],
             n_res: int, attn_res: Sequence[int]) -> Dict[str, Any]:
    """Walk ``{root}.{i}`` in the reference Sequential's construction order
    (encoder.py:43-97) emitting our flax Encoder names (models/encoder.py)."""
    i = 0
    params: Dict[str, Any] = {"conv_in": _conv2d(sd, f"{root}.{i}")}
    i += 1
    channels = [interm[0], *interm]
    size = img_size
    for n in range(len(channels) - 1):
        for r in range(n_res):
            params[f"stage{n}_res{r}"] = _res_block(sd, f"{root}.{i}"); i += 1
            if size in attn_res:
                params[f"stage{n}_attn{r}"] = _attn_block(sd, f"{root}.{i}"); i += 1
        if n != len(channels) - 2:
            params[f"stage{n}_down"] = {"conv": _conv2d(sd, f"{root}.{i}.conv")}
            i += 1
            size //= 2
    params["mid_res1"] = _res_block(sd, f"{root}.{i}"); i += 1
    params["mid_attn"] = _attn_block(sd, f"{root}.{i}"); i += 1
    params["mid_res2"] = _res_block(sd, f"{root}.{i}"); i += 1
    params["norm_out"] = _gn(sd, f"{root}.{i}"); i += 1
    i += 1  # Swish — parameterless Sequential slot
    params["conv_out"] = _conv2d(sd, f"{root}.{i}")
    return params


def _decoder(sd: _SD, root: str, *, latent_size: int, interm: Sequence[int],
             n_res: int, attn_res: Sequence[int]) -> Dict[str, Any]:
    """decoder.py:50-99 construction order → models/decoder.py names."""
    i = 0
    params: Dict[str, Any] = {"conv_in": _conv2d(sd, f"{root}.{i}")}
    i += 1
    params["mid_res1"] = _res_block(sd, f"{root}.{i}"); i += 1
    params["mid_attn"] = _attn_block(sd, f"{root}.{i}"); i += 1
    params["mid_res2"] = _res_block(sd, f"{root}.{i}"); i += 1
    channels = list(interm)[::-1]
    size = latent_size
    for n in range(len(channels)):
        for r in range(n_res):
            params[f"stage{n}_res{r}"] = _res_block(sd, f"{root}.{i}"); i += 1
            if size in attn_res:
                params[f"stage{n}_attn{r}"] = _attn_block(sd, f"{root}.{i}"); i += 1
        if n != 0:
            params[f"stage{n}_up"] = {"conv": _conv2d(sd, f"{root}.{i}.conv")}
            i += 1
            size *= 2
    params["norm_out"] = _gn(sd, f"{root}.{i}"); i += 1
    i += 1  # Swish
    params["conv_out"] = _conv2d(sd, f"{root}.{i}")
    return params


def convert_vqvae(state_dict: Dict[str, Any], *, img_size: int,
                  latent_size: int, intermediate_channels: Sequence[int],
                  n_res_encoder: int, n_res_decoder: int,
                  attn_res: Sequence[int]) -> Dict[str, Any]:
    """``vqvae.state_dict()`` (vqganVqvaeWorker.py:471) → models/vqvae.py params."""
    sd = _SD(state_dict)
    params = {
        "encoder": _encoder(sd, "encoder.model", img_size=img_size,
                            interm=intermediate_channels, n_res=n_res_encoder,
                            attn_res=attn_res),
        "decoder": _decoder(sd, "decoder.model", latent_size=latent_size,
                            interm=intermediate_channels, n_res=n_res_decoder,
                            attn_res=attn_res),
        "codebook": {"embedding": sd.take("codebook.codebook.weight")},
        "quant_conv": _conv2d(sd, "quant_conv"),
        "post_quant_conv": _conv2d(sd, "post_quant_conv"),
    }
    sd.assert_consumed()
    return params


def convert_vae(state_dict: Dict[str, Any], *, img_size: int,
                latent_size: int, intermediate_channels: Sequence[int],
                n_res_encoder: int, n_res_decoder: int,
                attn_res: Sequence[int]) -> Dict[str, Any]:
    """``'vae_state_dict'`` (vaeWorker.py:247; model network/vae/vae.py:31-59)
    → models/vae.py params."""
    sd = _SD(state_dict)
    params = {
        "encoder": _encoder(sd, "encoder.model", img_size=img_size,
                            interm=intermediate_channels, n_res=n_res_encoder,
                            attn_res=attn_res),
        "decoder": _decoder(sd, "decoder.model", latent_size=latent_size,
                            interm=intermediate_channels, n_res=n_res_decoder,
                            attn_res=attn_res),
        "fc_mu": _conv2d(sd, "fc_mu"),
        "fc_logvar": _conv2d(sd, "fc_logvar"),
    }
    sd.assert_consumed()
    return params


def convert_discriminator(state_dict: Dict[str, Any]
                          ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """PatchGAN discriminator state_dict (vqganVqvaeWorker.py:477; fixed
    Sequential layout discriminator.py) → (params, batch_stats)."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {"conv0": _conv2d(sd, "model.0"),
                              "conv_out": _conv2d(sd, "model.11")}
    stats: Dict[str, Any] = {}
    for i, base in enumerate((2, 5, 8), start=1):
        params[f"conv{i}"] = _conv2d(sd, f"model.{base}")
        bn_p, bn_s = _bn(sd, f"model.{base + 1}")
        params[f"bn{i}"] = bn_p
        stats[f"bn{i}"] = bn_s
    sd.assert_consumed()
    return params, stats


# ---------------------------------------------------------------------------
# minGPT (reference mingpt.py; vqTransformerWorker.py:231 saves it bare)
# ---------------------------------------------------------------------------

def convert_gpt(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Bare transformer ``state_dict()`` → models/mingpt.py params.
    The causal-mask buffer (mingpt.py:55) is a constant — skipped."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {
        "tok_emb": {"embedding": sd.take("tok_emb.weight")},
        "pos_emb": sd.take("pos_emb"),
        "ln_f": _ln(sd, "ln_f"),
        "head": {"kernel": sd.take("head.weight").T},
    }
    if "head.bias" in sd.sd:
        params["head"]["bias"] = sd.take("head.bias")
    for i in range(sd.max_index("blocks") + 1):
        b = f"blocks.{i}"
        sd.skip(f"{b}.attn.mask")
        params[f"block{i}"] = {
            "ln1": _ln(sd, f"{b}.ln1"), "ln2": _ln(sd, f"{b}.ln2"),
            "attn": {"query": _dense(sd, f"{b}.attn.query"),
                     "key": _dense(sd, f"{b}.attn.key"),
                     "value": _dense(sd, f"{b}.attn.value"),
                     "proj": _dense(sd, f"{b}.attn.proj")},
            "fc1": _dense(sd, f"{b}.mlp.0"),
            "fc2": _dense(sd, f"{b}.mlp.2"),
        }
    sd.assert_consumed()
    return params


# ---------------------------------------------------------------------------
# ShuffleNet U-Net (reference unet3d.py; gaussian3d + vq-diffusion denoiser)
# ---------------------------------------------------------------------------

def _convbnsilu(sd: _SD, p: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    # ConvBnSiLu.module = [Conv2d, BatchNorm2d, SiLU]
    bn_p, bn_s = _bn(sd, f"{p}.module.1")
    return ({"conv": _conv2d(sd, f"{p}.module.0"), "bn": bn_p}, {"bn": bn_s})


def _bottleneck(sd: _SD, p: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["b1_dw"] = _conv2d(sd, f"{p}.branch1.0")
    params["b1_bn"], stats["b1_bn"] = _bn(sd, f"{p}.branch1.1")
    params["b1_pw"], s = _convbnsilu(sd, f"{p}.branch1.2"); stats["b1_pw"] = s
    params["b2_pw1"], s = _convbnsilu(sd, f"{p}.branch2.0"); stats["b2_pw1"] = s
    params["b2_dw"] = _conv2d(sd, f"{p}.branch2.1")
    params["b2_bn"], stats["b2_bn"] = _bn(sd, f"{p}.branch2.2")
    params["b2_pw2"], s = _convbnsilu(sd, f"{p}.branch2.3"); stats["b2_pw2"] = s
    return params, stats


def _time_mlp(sd: _SD, p: str) -> Dict[str, Any]:
    return {"fc1": _dense(sd, f"{p}.mlp.0"), "fc2": _dense(sd, f"{p}.mlp.2")}


def convert_shuffle_unet(state_dict: Dict[str, Any], prefix: str = ""
                         ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference Unet3D state_dict (optionally under ``prefix``, e.g.
    ``model.`` inside a diffusion checkpoint) → (params, batch_stats) for
    models/unet_shuffle.py::ShuffleUNet."""
    if prefix:
        state_dict = {k[len(prefix):]: v for k, v in state_dict.items()
                      if k.startswith(prefix)}
    sd = _SD(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["init_conv"], stats["init_conv"] = _convbnsilu(sd, "init_conv")
    params["time_embedding"] = {"embedding": sd.take("time_embedding.weight")}
    for i in range(sd.max_index("encoder_blocks") + 1):
        e = f"encoder_blocks.{i}"
        ep: Dict[str, Any] = {}
        es: Dict[str, Any] = {}
        for k in range(4):
            ep[f"bn{k}"], es[f"bn{k}"] = _bottleneck(sd, f"{e}.conv0.{k}")
        ep["time_mlp"] = _time_mlp(sd, f"{e}.time_mlp")
        ep["down"], es["down"] = _bottleneck(sd, f"{e}.conv1")
        params[f"enc{i}"], stats[f"enc{i}"] = ep, es
    for i in range(sd.max_index("mid_block") + 1):
        params[f"mid{i}"], stats[f"mid{i}"] = _bottleneck(sd, f"mid_block.{i}")
    for i in range(sd.max_index("decoder_blocks") + 1):
        d = f"decoder_blocks.{i}"
        dp: Dict[str, Any] = {}
        ds: Dict[str, Any] = {}
        for k in range(4):
            dp[f"bn{k}"], ds[f"bn{k}"] = _bottleneck(sd, f"{d}.conv0.{k}")
        dp["time_mlp"] = _time_mlp(sd, f"{d}.time_mlp")
        dp["bn4"], ds["bn4"] = _bottleneck(sd, f"{d}.conv1")
        params[f"dec{i}"], stats[f"dec{i}"] = dp, ds
    params["final_conv"] = _conv2d(sd, "final_conv")
    sd.assert_consumed()
    return params, stats


# ---------------------------------------------------------------------------
# Conv1d U-Net (reference unet2d.py:215-357; gaussian2d's denoiser)
# ---------------------------------------------------------------------------

def _rms(sd: _SD, p: str) -> Dict[str, np.ndarray]:
    return {"g": sd.take(f"{p}.g").reshape(-1)}


def _resnet1d(sd: _SD, p: str) -> Dict[str, Any]:
    out = {"time_proj": _dense(sd, f"{p}.mlp.1"),
           "block1": {"proj": _conv1d(sd, f"{p}.block1.proj"),
                      "RMSNorm_0": _rms(sd, f"{p}.block1.norm")},
           "block2": {"proj": _conv1d(sd, f"{p}.block2.proj"),
                      "RMSNorm_0": _rms(sd, f"{p}.block2.norm")}}
    if sd.has(f"{p}.res_conv"):  # Identity when dims match
        out["res_conv"] = _conv1d(sd, f"{p}.res_conv")
    return out


def _attn1d(sd: _SD, p: str) -> Dict[str, Any]:
    # LinearAttention: to_out = Sequential(Conv1d, RMSNorm); Attention: Conv1d
    if sd.has(f"{p}.to_out.0"):
        return {"to_qkv": _conv1d(sd, f"{p}.to_qkv"),
                "to_out": _conv1d(sd, f"{p}.to_out.0"),
                "out_norm": _rms(sd, f"{p}.to_out.1")}
    return {"to_qkv": _conv1d(sd, f"{p}.to_qkv"),
            "to_out": _conv1d(sd, f"{p}.to_out")}


def convert_unet1d(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference Conv1d U-Net state_dict → models/unet1d.py::Unet1D params.
    EMA dicts from gaussianDiffusion2DWorker.py:169 convert identically."""
    sd = _SD(state_dict)
    params: Dict[str, Any] = {
        "init_conv": _conv1d(sd, "init_conv"),
        "time_fc1": _dense(sd, "time_mlp.1"),
        "time_fc2": _dense(sd, "time_mlp.3"),
        "final_res": _resnet1d(sd, "final_res_block"),
        "final_conv": _conv1d(sd, "final_conv"),
    }
    n_lin = 0
    for i in range(sd.max_index("downs") + 1):
        d = f"downs.{i}"
        params[f"down{i}_res1"] = _resnet1d(sd, f"{d}.0")
        params[f"down{i}_res2"] = _resnet1d(sd, f"{d}.1")
        params[f"down{i}_attn"] = {"RMSNorm_0": _rms(sd, f"{d}.2.fn.norm")}
        params[f"LinearAttention1D_{n_lin}"] = _attn1d(sd, f"{d}.2.fn.fn")
        n_lin += 1
        params[f"down{i}_down"] = _conv1d(sd, f"{d}.3")
    params["mid_res1"] = _resnet1d(sd, "mid_block1")
    params["mid_attn"] = {"RMSNorm_0": _rms(sd, "mid_attn.fn.norm")}
    params["Attention1D_0"] = _attn1d(sd, "mid_attn.fn.fn")
    params["mid_res2"] = _resnet1d(sd, "mid_block2")
    for i in range(sd.max_index("ups") + 1):
        u = f"ups.{i}"
        params[f"up{i}_res1"] = _resnet1d(sd, f"{u}.0")
        params[f"up{i}_res2"] = _resnet1d(sd, f"{u}.1")
        params[f"up{i}_attn"] = {"RMSNorm_0": _rms(sd, f"{u}.2.fn.norm")}
        params[f"LinearAttention1D_{n_lin}"] = _attn1d(sd, f"{u}.2.fn.fn")
        n_lin += 1
        # Upsample = Sequential(nearest-Upsample, Conv1d) → conv at .3.1;
        # the last stage is a bare Conv1d at .3 (unet2d.py's ups loop)
        params[f"up{i}_up"] = _conv1d(
            sd, f"{u}.3.1" if sd.has(f"{u}.3.1") else f"{u}.3")
    sd.assert_consumed()
    return params


# ---------------------------------------------------------------------------
# Discrete VQ-diffusion checkpoint (vqdiffusionWorker.py:243-248)
# ---------------------------------------------------------------------------

#: schedule buffers the reference registers (diffusion_vq_official.py:157-167)
#: that our diffusion/discrete.py recomputes from the config at build time
_DISCRETE_SCHEDULE_BUFFERS = (
    "log_at", "log_bt", "log_ct", "log_cumprod_at", "log_cumprod_bt",
    "log_cumprod_ct", "log_1_min_ct", "log_1_min_cumprod_ct",
    "zero_vector", "prior_ps", "prior_weight",
)


def convert_discrete_diffusion(state_dict: Dict[str, Any]
                               ) -> Tuple[Dict[str, Any], Dict[str, Any],
                                          np.ndarray, np.ndarray]:
    """``ckpt['diffusion']`` (denoiser under ``model.`` +
    registered buffers) → (unet_params, unet_batch_stats, Lt_history,
    Lt_count). Schedule buffers are dropped — diffusion/discrete.py
    recomputes them exactly (parity-tested against alpha_schedule). The
    denoiser kind (ShuffleNet Unet3D vs Conv1d Unet2D — the two
    vqDiffusion.py:59-71 instantiates) is detected from the keys."""
    denoiser = {k[len("model."):]: v for k, v in state_dict.items()
                if k.startswith("model.")}
    rest = {k: np.asarray(v) for k, v in state_dict.items()
            if not k.startswith("model.")}
    if any(k.startswith("encoder_blocks.") for k in denoiser):
        params, stats = convert_shuffle_unet(denoiser)
    else:
        params, stats = convert_unet1d(denoiser), {}
    lt_history = rest.pop("Lt_history", None)
    lt_count = rest.pop("Lt_count", None)
    if lt_history is None or lt_count is None:
        raise ValueError("diffusion state_dict lacks Lt_history/Lt_count "
                         "buffers — not a reference vq-diffusion checkpoint?")
    unknown = [k for k in rest if k not in _DISCRETE_SCHEDULE_BUFFERS]
    if unknown:
        raise ValueError(f"unrecognized diffusion buffers: {unknown}")
    return params, stats, lt_history, lt_count
