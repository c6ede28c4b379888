from .base import BaseWorker
from .vae_worker import VAEWorker
from .vqgan_worker import VQGANVQVAEWorker
from .vq_transformer_worker import VQTransformerWorker

__all__ = ["BaseWorker", "VAEWorker", "VQGANVQVAEWorker", "VQTransformerWorker"]


def build_worker(model_name: str):
    """Dispatch model_name → worker class (reference train.py:90-263)."""
    if model_name in ("vqvae", "vqgan"):
        return VQGANVQVAEWorker
    if model_name == "vae":
        return VAEWorker
    if model_name in ("vqvae_transformer", "vqgan_transformer"):
        return VQTransformerWorker
    if model_name == "vqdiffusion":
        from .vq_diffusion_worker import VQDiffusionWorker
        return VQDiffusionWorker
    if model_name == "gaussiandiffusion2d":
        from .gaussian_diffusion_workers import GaussianDiffusion2DWorker
        return GaussianDiffusion2DWorker
    if model_name == "gaussiandiffusion3d":
        from .gaussian_diffusion_workers import GaussianDiffusion3DWorker
        return GaussianDiffusion3DWorker
    if model_name in ("c_vqdiffusion", "v_vqdiffusion"):
        from .continuous_vq_worker import ContinuousVQDiffusionWorker
        return ContinuousVQDiffusionWorker
    raise ValueError(f"unknown model_name {model_name!r}")
