"""Reconstruction / sample-quality metrics (SURVEY §7 step 8 parity harness).

- ``psnr`` / ``ssim``: standard reconstruction metrics over [0,1] images;
- ``feature_fid``: Fréchet distance between VGG-feature Gaussians. With
  lpips-0.1.4 weights loaded this is a VGG-FID; with the deterministic random
  VGG fallback it is a random-feature FID (a valid distributional distance —
  documented divergence from Inception-FID, which needs weights this
  zero-egress image cannot fetch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Global (single-window) SSIM over [N,H,W,C] batches."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    var_a, var_b = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2)) /
                 ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))


def _vgg_features(images: np.ndarray, lpips_params=None,
                  batch: int = 64) -> np.ndarray:
    """Pooled deepest-tap VGG features [N, 512] for FID."""
    from ..models.lpips import VGG16Features, load_lpips_params

    if lpips_params is None:
        lpips_params = load_lpips_params(img_channels=images.shape[-1])
    vgg = VGG16Features()
    params = lpips_params["vgg"]

    @jax.jit
    def feats(x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        taps = vgg.apply({"params": params}, x * 2.0 - 1.0)
        return jnp.mean(taps[-1], axis=(1, 2))

    out = []
    for i in range(0, len(images), batch):
        out.append(np.asarray(feats(jnp.asarray(images[i:i + batch]))))
    return np.concatenate(out)


def feature_fid(real: np.ndarray, fake: np.ndarray, lpips_params=None) -> float:
    """Fréchet distance between feature Gaussians of real/fake [N,H,W,C]∈[0,1]."""
    import scipy.linalg

    fr = _vgg_features(real, lpips_params).astype(np.float64)
    ff = _vgg_features(fake, lpips_params).astype(np.float64)
    mu_r, mu_f = fr.mean(0), ff.mean(0)
    cov_r = np.cov(fr, rowvar=False) + 1e-6 * np.eye(fr.shape[1])
    cov_f = np.cov(ff, rowvar=False) + 1e-6 * np.eye(ff.shape[1])
    covmean = scipy.linalg.sqrtm(cov_r @ cov_f)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu_r - mu_f
    return float(diff @ diff + np.trace(cov_r + cov_f - 2 * covmean))
