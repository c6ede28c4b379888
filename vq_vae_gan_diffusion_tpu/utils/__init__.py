from .compile_cache import enable_compilation_cache
from .ema import adjusted_decay, ema_update
from .experiment import (MetricWriter, adaptive_save_step, create_run_dir,
                         latest_checkpoint_step, restore_checkpoint,
                         save_checkpoint, setup_logging)
from .init_utils import init_on_cpu
from .profiling import (clean_directory, device_memory_stats,
                        log_device_memory, param_count, print_summary,
                        profile_steps, reproducibility)
from .image import make_grid, psnr, save_gif, save_image, to_uint8

__all__ = [
    "enable_compilation_cache", "adjusted_decay", "ema_update", "MetricWriter", "adaptive_save_step",
    "create_run_dir", "latest_checkpoint_step", "restore_checkpoint",
    "save_checkpoint", "setup_logging", "make_grid", "psnr", "save_gif",
    "save_image", "to_uint8", "init_on_cpu", "clean_directory", "device_memory_stats", "log_device_memory", "param_count", "print_summary", "profile_steps", "reproducibility",
]
