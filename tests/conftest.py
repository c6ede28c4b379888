"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of a fake distributed backend (SURVEY §4d): the same
Mesh/NamedSharding code paths that run on a v5e-8 run here on 8 host-platform
devices. Must set the env vars before jax initializes.
"""

import os

# jax is PRELOADED by sitecustomize on this image, so env-var platform hints
# (JAX_PLATFORM_NAME/JAX_PLATFORMS) read at import time are already consumed.
# Backends initialize lazily though: XLA_FLAGS (read at backend creation) and
# jax.config.update('jax_platforms') still take effect here — this is the
# reliable way to pin the suite to the virtual 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh():
    from vq_vae_gan_diffusion_tpu.parallel import create_mesh
    return create_mesh()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_config():
    """A miniature config exercising the full schema on 32×32 inputs."""
    from vq_vae_gan_diffusion_tpu.config import config_from_dict
    return config_from_dict({
        "architecture": {
            "model_name": "vqvae",
            "vqvae": {
                "latent_channels": 32,
                "latent_size": 8,
                "intermediate_channels": [16, 32, 32],
                "num_residual_blocks_encoder": 1,
                "num_residual_blocks_decoder": 1,
                "dropout": 0.0,
                "attention_resolution": [8],
                "num_codebook_vectors": 64,
                "resume_path": "None",
                "train_model": True,
                "freeze_weights": False,
            },
            "vae": {
                "latent_channels": 32,
                "latent_size": 8,
                "intermediate_channels": [16, 32, 32],
                "num_residual_blocks_encoder": 1,
                "num_residual_blocks_decoder": 1,
                "dropout": 0.0,
                "attention_resolution": [8],
            },
            "vqvae_transformer": {
                "sos_token": 0,
                "pkeep": 0.5,
                "block_size": 128,
                "n_layer": 2,
                "n_head": 4,
                "n_embd": 32,
                "resume_path": None,
                "train_model": True,
                "freeze_weights": False,
            },
            "vqdiffusion": {
                "diffusion_steps": 8,
                "sampling_steps": 8,
                "noise_schedule": "linear",
                "diffusion_type": "gaussiandiffusion3d",
                "objective": "pred_noise",
                "resume_path": None,
                "train_model": True,
                "freeze_weights": False,
                "indices_to_dist_fn": "lookup_table",
                "gaussian_dim": 16,
                "distribute_dim": -1,
                "clipped_reverse_diffusion": True,
                "unet_dim": 3,
                "sample_method": "ddpm",
                "loss_fn": "noise_mse",
                "return_all_timestamps": False,
                "compute_indices_recon_loss": True,
            },
            "gaussiandiffusion2d": {
                "resume_path": None,
                "diffusion_steps": 8,
                "sampling_steps": 8,
                "train_model": True,
                "freeze_weights": False,
            },
            "gaussiandiffusion3d": {
                "resume_path": None,
                "train_model": True,
                "freeze_weights": False,
                "n_samples": 4,
                "model_base_dim": 16,
                "diffusion_steps": 8,
                "sampling_steps": 8,
            },
        },
        "dataset": {
            "dataset_name": "synthetic",
            "mean": [0.5, 0.5, 0.5],
            "std": [0.5, 0.5, 0.5],
            "num_workers": 0,
            "return_annotations": False,
            "max_train_samples": 64,
            "max_val_samples": 16,
            "train_split": "train",
            "train_shuffle": True,
            "subset": True,
            "img_channels": {"synthetic": 3, "mnist": 1},
            "img_size": {"synthetic": 32, "mnist": 28},
            "batch_size": {
                "vqvae": {"synthetic": 8, "mnist": 8},
                "vqgan": {"synthetic": 8, "mnist": 8},
                "vqgan_transformer": {"synthetic": 8, "mnist": 8},
                "vqdiffusion": {"synthetic": 8, "mnist": 8},
                "gaussiandiffusion2d": {"synthetic": 8, "mnist": 8},
                "gaussiandiffusion3d": {"synthetic": 8, "mnist": 8},
            },
        },
        "trainer": {
            "num_epochs": 1,
            "log_dir": "/tmp/vqgd_test_logs",
            "num_workers": 0,
            "vqvae": {
                "learning_rate": 2.25e-4, "beta1": 0.5, "beta2": 0.9,
                "perceptual_loss_factor": 1.0, "rec_loss_factor": 1.0,
                "perceptual_model": "vgg",
            },
            "vae": {"learning_rate": 1e-4, "kld_weight": 1e-4},
            "vqvae_transformer": {"learning_rate": 4.5e-4, "beta1": 0.9, "beta2": 0.95},
            "descriminator": {"disc_factor": 1.0, "disc_start": 2, "resume_path": None},
            "vqdiffusion": {
                "learning_rate": 1e-4, "beta1": 0.65, "beta2": 0.95,
                "kl_loss_factor": 1.0, "rec_loss_factor": 1.0,
                "model_ema_steps": 2, "model_ema_decay": 0.995, "no_clip": False,
            },
            "gaussiandiffusion2d": {
                "learning_rate": 1.5e-4, "adam_betas": "(0.65, 0.95)",
                "kl_loss_factor": 1.0, "rec_loss_factor": 1.0,
            },
            "gaussiandiffusion3d": {
                "learning_rate": 1e-3, "model_ema_steps": 2,
                "model_ema_decay": 0.995, "no_clip": False,
            },
        },
    })
