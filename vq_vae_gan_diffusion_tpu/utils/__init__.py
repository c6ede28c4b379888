from .ema import adjusted_decay, ema_update
from .experiment import (MetricWriter, adaptive_save_step, create_run_dir,
                         latest_checkpoint_step, restore_checkpoint,
                         save_checkpoint, setup_logging)
from .image import make_grid, psnr, save_gif, save_image, to_uint8

__all__ = [
    "adjusted_decay", "ema_update", "MetricWriter", "adaptive_save_step",
    "create_run_dir", "latest_checkpoint_step", "restore_checkpoint",
    "save_checkpoint", "setup_logging", "make_grid", "psnr", "save_gif",
    "save_image", "to_uint8",
]
