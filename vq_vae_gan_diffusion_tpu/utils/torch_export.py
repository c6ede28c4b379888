"""This framework's flax pytrees → reference (torch) ``state_dict`` flavors.

The inverse of utils/torch_import.py: given params trained here, emit the
exact ``state_dict`` the reference's torch modules ``load_state_dict(...,
strict=True)`` — so models trained on TPU can be evaluated or finetuned with
the reference's torch tooling (its LPIPS/FID stacks, its samplers), and so
the import mapping is validated as a lossless round-trip
(tests/test_torch_import.py asserts export∘import ≡ identity on every
family).

Key layouts mirror the import walks 1:1; see torch_import.py's module
docstring for the reference save-flavor citations. Synthesized buffers the
flax side doesn't keep: BatchNorm ``num_batches_tracked`` is emitted as 0
(only consulted by torch's ``momentum=None`` mode, which the reference never
uses) and minGPT's constant causal-mask buffer (mingpt.py:55) is regenerated
from the positional-embedding length.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np

__all__ = [
    "export_vqvae", "export_vae", "export_discriminator", "export_gpt",
    "export_shuffle_unet", "export_unet1d",
]


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv2d(out: Dict[str, np.ndarray], p: str, sub: Dict[str, Any]) -> None:
    out[f"{p}.weight"] = np.transpose(_np(sub["kernel"]), (3, 2, 0, 1))
    if "bias" in sub:
        out[f"{p}.bias"] = _np(sub["bias"])


def _conv1d(out, p: str, sub) -> None:
    out[f"{p}.weight"] = np.transpose(_np(sub["kernel"]), (2, 1, 0))
    if "bias" in sub:
        out[f"{p}.bias"] = _np(sub["bias"])


def _dense(out, p: str, sub) -> None:
    out[f"{p}.weight"] = _np(sub["kernel"]).T
    if "bias" in sub:
        out[f"{p}.bias"] = _np(sub["bias"])


def _ln(out, p: str, sub) -> None:
    out[f"{p}.weight"] = _np(sub["scale"])
    out[f"{p}.bias"] = _np(sub["bias"])


def _gn(out, p: str, sub) -> None:
    inner = sub["GroupNorm_0"]
    out[f"{p}.group_norm.weight"] = _np(inner["scale"])
    out[f"{p}.group_norm.bias"] = _np(inner["bias"])


def _bn(out, p: str, sub_p, sub_s) -> None:
    out[f"{p}.weight"] = _np(sub_p["scale"])
    out[f"{p}.bias"] = _np(sub_p["bias"])
    out[f"{p}.running_mean"] = _np(sub_s["mean"])
    out[f"{p}.running_var"] = _np(sub_s["var"])
    out[f"{p}.num_batches_tracked"] = np.array(0, dtype=np.int64)


def _res_block(out, p: str, sub) -> None:
    # flax ResidualBlock keeps two GN *wrappers* named GroupNorm_0/GroupNorm_1,
    # each nesting one real flax GroupNorm (again GroupNorm_0 inside)
    _gn(out, f"{p}.block.0", sub["GroupNorm_0"])
    _conv2d(out, f"{p}.block.2", sub["conv1"])
    _gn(out, f"{p}.block.3", sub["GroupNorm_1"])
    _conv2d(out, f"{p}.block.6", sub["conv2"])
    if "shortcut" in sub:
        _conv2d(out, f"{p}.conv_shortcut", sub["shortcut"])


def _attn_block(out, p: str, sub) -> None:
    _gn(out, f"{p}.norm", sub["GroupNorm_0"])
    _conv2d(out, f"{p}.q", sub["q"])
    _conv2d(out, f"{p}.k", sub["k"])
    _conv2d(out, f"{p}.v", sub["v"])
    _conv2d(out, f"{p}.project_out", sub["proj_out"])


def _encoder(out, root: str, sub, *, img_size: int, interm: Sequence[int],
             n_res: int, attn_res: Sequence[int]) -> None:
    i = 0
    _conv2d(out, f"{root}.{i}", sub["conv_in"]); i += 1
    channels = [interm[0], *interm]
    size = img_size
    for n in range(len(channels) - 1):
        for r in range(n_res):
            _res_block(out, f"{root}.{i}", sub[f"stage{n}_res{r}"]); i += 1
            if size in attn_res:
                _attn_block(out, f"{root}.{i}", sub[f"stage{n}_attn{r}"]); i += 1
        if n != len(channels) - 2:
            _conv2d(out, f"{root}.{i}.conv", sub[f"stage{n}_down"]["conv"])
            i += 1
            size //= 2
    _res_block(out, f"{root}.{i}", sub["mid_res1"]); i += 1
    _attn_block(out, f"{root}.{i}", sub["mid_attn"]); i += 1
    _res_block(out, f"{root}.{i}", sub["mid_res2"]); i += 1
    _gn(out, f"{root}.{i}", sub["norm_out"]); i += 1
    i += 1  # Swish
    _conv2d(out, f"{root}.{i}", sub["conv_out"])


def _decoder(out, root: str, sub, *, latent_size: int, interm: Sequence[int],
             n_res: int, attn_res: Sequence[int]) -> None:
    i = 0
    _conv2d(out, f"{root}.{i}", sub["conv_in"]); i += 1
    _res_block(out, f"{root}.{i}", sub["mid_res1"]); i += 1
    _attn_block(out, f"{root}.{i}", sub["mid_attn"]); i += 1
    _res_block(out, f"{root}.{i}", sub["mid_res2"]); i += 1
    channels = list(interm)[::-1]
    size = latent_size
    for n in range(len(channels)):
        for r in range(n_res):
            _res_block(out, f"{root}.{i}", sub[f"stage{n}_res{r}"]); i += 1
            if size in attn_res:
                _attn_block(out, f"{root}.{i}", sub[f"stage{n}_attn{r}"]); i += 1
        if n != 0:
            _conv2d(out, f"{root}.{i}.conv", sub[f"stage{n}_up"]["conv"])
            i += 1
            size *= 2
    _gn(out, f"{root}.{i}", sub["norm_out"]); i += 1
    i += 1  # Swish
    _conv2d(out, f"{root}.{i}", sub["conv_out"])


def export_vqvae(params: Dict[str, Any], *, img_size: int, latent_size: int,
                 intermediate_channels: Sequence[int], n_res_encoder: int,
                 n_res_decoder: int, attn_res: Sequence[int]
                 ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _encoder(out, "encoder.model", params["encoder"], img_size=img_size,
             interm=intermediate_channels, n_res=n_res_encoder,
             attn_res=attn_res)
    _decoder(out, "decoder.model", params["decoder"], latent_size=latent_size,
             interm=intermediate_channels, n_res=n_res_decoder,
             attn_res=attn_res)
    out["codebook.codebook.weight"] = _np(params["codebook"]["embedding"])
    _conv2d(out, "quant_conv", params["quant_conv"])
    _conv2d(out, "post_quant_conv", params["post_quant_conv"])
    return out


def export_vae(params: Dict[str, Any], *, img_size: int, latent_size: int,
               intermediate_channels: Sequence[int], n_res_encoder: int,
               n_res_decoder: int, attn_res: Sequence[int]
               ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _encoder(out, "encoder.model", params["encoder"], img_size=img_size,
             interm=intermediate_channels, n_res=n_res_encoder,
             attn_res=attn_res)
    _decoder(out, "decoder.model", params["decoder"], latent_size=latent_size,
             interm=intermediate_channels, n_res=n_res_decoder,
             attn_res=attn_res)
    _conv2d(out, "fc_mu", params["fc_mu"])
    _conv2d(out, "fc_logvar", params["fc_logvar"])
    return out


def export_discriminator(params: Dict[str, Any], batch_stats: Dict[str, Any]
                         ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _conv2d(out, "model.0", params["conv0"])
    _conv2d(out, "model.11", params["conv_out"])
    for i, base in enumerate((2, 5, 8), start=1):
        _conv2d(out, f"model.{base}", params[f"conv{i}"])
        _bn(out, f"model.{base + 1}", params[f"bn{i}"], batch_stats[f"bn{i}"])
    return out


def export_gpt(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        "tok_emb.weight": _np(params["tok_emb"]["embedding"]),
        "pos_emb": _np(params["pos_emb"]),
    }
    _ln(out, "ln_f", params["ln_f"])
    out["head.weight"] = _np(params["head"]["kernel"]).T
    if "bias" in params["head"]:
        out["head.bias"] = _np(params["head"]["bias"])
    block_size = int(np.shape(params["pos_emb"])[1])
    mask = np.tril(np.ones((block_size, block_size), np.float32))
    mask = mask.reshape(1, 1, block_size, block_size)
    i = 0
    while f"block{i}" in params:
        sub = params[f"block{i}"]
        b = f"blocks.{i}"
        _ln(out, f"{b}.ln1", sub["ln1"])
        _ln(out, f"{b}.ln2", sub["ln2"])
        for name in ("query", "key", "value", "proj"):
            _dense(out, f"{b}.attn.{name}", sub["attn"][name])
        out[f"{b}.attn.mask"] = mask
        _dense(out, f"{b}.mlp.0", sub["fc1"])
        _dense(out, f"{b}.mlp.2", sub["fc2"])
        i += 1
    return out


# ---------------------------------------------------------------------------
# ShuffleNet U-Net / Conv1d U-Net
# ---------------------------------------------------------------------------

def _convbnsilu(out, p: str, sub_p, sub_s) -> None:
    _conv2d(out, f"{p}.module.0", sub_p["conv"])
    _bn(out, f"{p}.module.1", sub_p["bn"], sub_s["bn"])


def _bottleneck(out, p: str, sub_p, sub_s) -> None:
    _conv2d(out, f"{p}.branch1.0", sub_p["b1_dw"])
    _bn(out, f"{p}.branch1.1", sub_p["b1_bn"], sub_s["b1_bn"])
    _convbnsilu(out, f"{p}.branch1.2", sub_p["b1_pw"], sub_s["b1_pw"])
    _convbnsilu(out, f"{p}.branch2.0", sub_p["b2_pw1"], sub_s["b2_pw1"])
    _conv2d(out, f"{p}.branch2.1", sub_p["b2_dw"])
    _bn(out, f"{p}.branch2.2", sub_p["b2_bn"], sub_s["b2_bn"])
    _convbnsilu(out, f"{p}.branch2.3", sub_p["b2_pw2"], sub_s["b2_pw2"])


def _time_mlp(out, p: str, sub) -> None:
    _dense(out, f"{p}.mlp.0", sub["fc1"])
    _dense(out, f"{p}.mlp.2", sub["fc2"])


def export_shuffle_unet(params: Dict[str, Any], batch_stats: Dict[str, Any]
                        ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _convbnsilu(out, "init_conv", params["init_conv"],
                batch_stats["init_conv"])
    out["time_embedding.weight"] = _np(params["time_embedding"]["embedding"])
    i = 0
    while f"enc{i}" in params:
        e, ep, es = f"encoder_blocks.{i}", params[f"enc{i}"], batch_stats[f"enc{i}"]
        for k in range(4):
            _bottleneck(out, f"{e}.conv0.{k}", ep[f"bn{k}"], es[f"bn{k}"])
        _time_mlp(out, f"{e}.time_mlp", ep["time_mlp"])
        _bottleneck(out, f"{e}.conv1", ep["down"], es["down"])
        i += 1
    i = 0
    while f"mid{i}" in params:
        _bottleneck(out, f"mid_block.{i}", params[f"mid{i}"],
                    batch_stats[f"mid{i}"])
        i += 1
    i = 0
    while f"dec{i}" in params:
        d, dp, ds = f"decoder_blocks.{i}", params[f"dec{i}"], batch_stats[f"dec{i}"]
        for k in range(4):
            _bottleneck(out, f"{d}.conv0.{k}", dp[f"bn{k}"], ds[f"bn{k}"])
        _time_mlp(out, f"{d}.time_mlp", dp["time_mlp"])
        _bottleneck(out, f"{d}.conv1", dp["bn4"], ds["bn4"])
        i += 1
    _conv2d(out, "final_conv", params["final_conv"])
    return out


def _rms(out, p: str, sub) -> None:
    out[f"{p}.g"] = _np(sub["g"]).reshape(1, -1, 1)  # torch RMSNorm [1,dim,1]


def _resnet1d(out, p: str, sub) -> None:
    _dense(out, f"{p}.mlp.1", sub["time_proj"])
    _conv1d(out, f"{p}.block1.proj", sub["block1"]["proj"])
    _rms(out, f"{p}.block1.norm", sub["block1"]["RMSNorm_0"])
    _conv1d(out, f"{p}.block2.proj", sub["block2"]["proj"])
    _rms(out, f"{p}.block2.norm", sub["block2"]["RMSNorm_0"])
    if "res_conv" in sub:
        _conv1d(out, f"{p}.res_conv", sub["res_conv"])


def _attn1d(out, p: str, sub) -> None:
    _conv1d(out, f"{p}.to_qkv", sub["to_qkv"])
    if "out_norm" in sub:  # LinearAttention: to_out = Sequential(conv, RMS)
        _conv1d(out, f"{p}.to_out.0", sub["to_out"])
        _rms(out, f"{p}.to_out.1", sub["out_norm"])
    else:
        _conv1d(out, f"{p}.to_out", sub["to_out"])


def export_unet1d(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _conv1d(out, "init_conv", params["init_conv"])
    _dense(out, "time_mlp.1", params["time_fc1"])
    _dense(out, "time_mlp.3", params["time_fc2"])
    _resnet1d(out, "final_res_block", params["final_res"])
    _conv1d(out, "final_conv", params["final_conv"])
    n_down = 0
    while f"down{n_down}_res1" in params:
        n_down += 1
    n_lin = 0
    for i in range(n_down):
        d = f"downs.{i}"
        _resnet1d(out, f"{d}.0", params[f"down{i}_res1"])
        _resnet1d(out, f"{d}.1", params[f"down{i}_res2"])
        _rms(out, f"{d}.2.fn.norm", params[f"down{i}_attn"]["RMSNorm_0"])
        _attn1d(out, f"{d}.2.fn.fn", params[f"LinearAttention1D_{n_lin}"])
        n_lin += 1
        _conv1d(out, f"{d}.3", params[f"down{i}_down"])
    _resnet1d(out, "mid_block1", params["mid_res1"])
    _rms(out, "mid_attn.fn.norm", params["mid_attn"]["RMSNorm_0"])
    _attn1d(out, "mid_attn.fn.fn", params["Attention1D_0"])
    _resnet1d(out, "mid_block2", params["mid_res2"])
    n_up = 0
    while f"up{n_up}_res1" in params:
        n_up += 1
    for i in range(n_up):
        u = f"ups.{i}"
        _resnet1d(out, f"{u}.0", params[f"up{i}_res1"])
        _resnet1d(out, f"{u}.1", params[f"up{i}_res2"])
        _rms(out, f"{u}.2.fn.norm", params[f"up{i}_attn"]["RMSNorm_0"])
        _attn1d(out, f"{u}.2.fn.fn", params[f"LinearAttention1D_{n_lin}"])
        n_lin += 1
        # Upsample = Sequential(nearest, Conv1d) except the last stage's bare
        # Conv1d (unet2d.py:51-55 + the is_last branch in the ups loop)
        _conv1d(out, f"{u}.3.1" if i != n_up - 1 else f"{u}.3",
                params[f"up{i}_up"])
    return out
