from .discrete import (DiscreteDiffusion, LtState, index_to_log_onehot,
                       log_onehot_to_index)
from .gaussian import (GaussianSchedule, ddim_sample, ddpm_sample,
                       diffusion_loss, make_schedule, model_predictions,
                       q_posterior, q_sample)
from .gaussian2d import GaussianDiffusion2D, GaussianDiffusion2DConfig
from .gaussian3d import (GaussianDiffusion3D, VQGaussianDiffusion3D,
                         positional_encoding_table)
from .schedules import (cosine_betas, discrete_alpha_schedule, get_betas,
                        linear_betas)

__all__ = [
    "DiscreteDiffusion", "LtState", "index_to_log_onehot", "log_onehot_to_index",
    "GaussianSchedule", "ddim_sample", "ddpm_sample", "diffusion_loss",
    "make_schedule", "model_predictions", "q_posterior", "q_sample",
    "GaussianDiffusion2D", "GaussianDiffusion2DConfig", "GaussianDiffusion3D",
    "VQGaussianDiffusion3D", "positional_encoding_table", "cosine_betas",
    "discrete_alpha_schedule", "get_betas", "linear_betas",
]
