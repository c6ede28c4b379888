"""LPIPS perceptual loss (VGG16 backbone) in JAX.

The reference uses ``lpips.LPIPS(net='vgg')`` (lpips 0.1.4, downloaded
pretrained weights; vqganVqvaeWorker.py:107, applied at :187). This module
reimplements the same computation graph:

1. scale inputs with the fixed LPIPS shift/scale constants,
2. run VGG16 features, tapping relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3,
3. channel-unit-normalize each tap,
4. squared difference → learned 1×1 "lin" weights → spatial mean → sum taps.

Weight loading: this environment has no network egress and no torchvision, so
pretrained VGG16 + lin weights must be supplied on disk. ``load_lpips_params``
accepts either

- an ``.npz`` produced by ``tools/export_lpips_weights.py`` (run it anywhere
  torchvision+lpips are installed), or
- a torch ``.pth`` state dict (torch-cpu is available here for conversion).

When no weights are found we fall back to a **deterministically seeded random
VGG** (documented divergence): random conv features are a known usable
perceptual metric, the loss stays well-defined and the VQGAN path remains
end-to-end trainable; swap in real weights for strict lpips-0.1.4 parity.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

log = logging.getLogger(__name__)

# VGG16 conv plan: (channels, num convs) per stage; taps after the last relu of
# each stage, maxpool between stages.
_VGG16_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# lpips.ScalingLayer constants (lpips/lpips.py upstream)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the five LPIPS tap activations."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        for s, (ch, n_convs) in enumerate(_VGG16_STAGES):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"conv{s}_{i}")(x)
                x = nn.relu(x)
            taps.append(x)
            if s < len(_VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Full LPIPS: scaling → VGG taps → unit-normalize → lin heads → mean.

    Returns a per-pixel-broadcastable map of shape [B, 1, 1, 1] (the reference
    adds its scalar-ish LPIPS map to the [B,C,H,W] L1 map and relies on
    broadcasting, vqganVqvaeWorker.py:187-200; lpips returns [B,1,1,1] with
    spatial mean by default, which broadcasts the same way here in NHWC).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        # grayscale → RGB (lpips expects 3 channels; MNIST path)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
            y = jnp.repeat(y, 3, axis=-1)
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        xs = (x - shift) / scale
        ys = (y - shift) / scale

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(xs)
        fy = vgg(ys)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            # upstream lpips normalize_tensor adds eps OUTSIDE the sqrt
            a = a / (jnp.sqrt(jnp.sum(a.astype(jnp.float32) ** 2, -1,
                                      keepdims=True)) + 1e-10).astype(a.dtype)
            b = b / (jnp.sqrt(jnp.sum(b.astype(jnp.float32) ** 2, -1,
                                      keepdims=True)) + 1e-10).astype(b.dtype)
            diff = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (diff.shape[-1],))
            lin = jnp.einsum("bhwc,c->bhw", diff, jnp.abs(w))  # lin weights are non-negative
            total = total + jnp.mean(lin, axis=(1, 2))
        return total.reshape(-1, 1, 1, 1)


def _random_lpips_params(rng: jax.Array, img_channels: int = 3) -> Dict:
    model = LPIPS()
    dummy = jnp.zeros((1, 64, 64, img_channels), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):  # fast, cache-friendly init
        variables = model.init(rng, dummy, dummy)
    return variables["params"]


def load_lpips_params(path: Optional[str] = None, img_channels: int = 3,
                      seed: int = 42) -> Dict:
    """Load LPIPS params from disk, else deterministic random fallback.

    Search order: explicit ``path`` → $LPIPS_WEIGHTS → ./weights/lpips_vgg.npz.
    """
    candidates = [path, os.environ.get("LPIPS_WEIGHTS"),
                  os.path.join("weights", "lpips_vgg.npz")]
    for cand in candidates:
        if cand and os.path.exists(cand):
            if cand.endswith(".npz"):
                return _params_from_npz(cand)
            if cand.endswith((".pth", ".pt")):
                return _params_from_torch(cand)
    log.warning("LPIPS pretrained weights not found; using deterministic "
                "random VGG features (set $LPIPS_WEIGHTS for lpips-0.1.4 parity)")
    return _random_lpips_params(jax.random.PRNGKey(seed), img_channels)


def _params_from_npz(path: str) -> Dict:
    """npz keys: vgg/conv{s}_{i}/kernel|bias (HWIO), lin{i}."""
    data = np.load(path)
    params: Dict[str, Any] = {"vgg": {}}
    for key in data.files:
        arr = jnp.asarray(data[key])
        if key.startswith("vgg/"):
            _, conv, leaf = key.split("/")
            params["vgg"].setdefault(conv, {})[leaf] = arr
        else:
            params[key] = arr
    return params


def _params_from_torch(path: str) -> Dict:
    """Convert a torch VGG16(+lpips lin) state dict: OIHW → HWIO."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    convs = sorted(
        (k for k in sd if k.endswith(".weight") and sd[k].dim() == 4 and "lin" not in k),
        key=lambda k: [int(t) for t in k.replace(".weight", "").split(".") if t.isdigit()])
    params: Dict[str, Any] = {"vgg": {}}
    flat_names = [f"conv{s}_{i}" for s, (_, n) in enumerate(_VGG16_STAGES) for i in range(n)]
    for name, k in zip(flat_names, convs):
        w = sd[k].numpy()
        b = sd[k.replace("weight", "bias")].numpy()
        params["vgg"][name] = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                               "bias": jnp.asarray(b)}
    lin_keys = sorted(k for k in sd if "lin" in k and k.endswith("weight"))
    for i, k in enumerate(lin_keys):
        params[f"lin{i}"] = jnp.asarray(sd[k].numpy().reshape(-1))
    if not lin_keys:
        for i, (ch, _) in enumerate(_VGG16_STAGES):
            params[f"lin{i}"] = jnp.ones((ch,), jnp.float32)
    return params
