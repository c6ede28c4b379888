"""vq_vae_gan_diffusion_tpu — a TPU-native JAX framework for VQ-VAE / VQ-GAN /
VQ-Transformer / VQ-Diffusion / Gaussian-Diffusion training and generation.

Re-implements the full capability surface of the reference PyTorch stack
(hongrui16/VQ-VAE-GAN-Diffusion) with a TPU-first design:

- flax.linen modules over NHWC layouts (TPU conv-friendly),
- a single jitted ``train_step(state, batch, rng) -> (state, metrics)`` per
  workload,
- sampling loops (DDPM/DDIM reverse processes, autoregressive token decoding)
  as on-device ``jax.lax.scan``,
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding (works identically
  on a virtual CPU mesh and on TPU slices; XLA inserts the collectives),
- a fused Pallas kernel for the codebook nearest-neighbour quantization.

Package layout mirrors the reference's layer map (SURVEY.md §1):

- :mod:`.config`    — YAML config schema (reference ``configs/*.yml`` compatible)
- :mod:`.models`    — encoder/decoder/codebook/VQVAE/VAE/discriminator/GPT/U-Nets
- :mod:`.diffusion` — schedules + Gaussian & discrete diffusion processes
- :mod:`.ops`       — Pallas TPU kernels
- :mod:`.parallel`  — mesh/sharding helpers
- :mod:`.data`      — dataset readers + host→device pipeline
- :mod:`.train`     — workers (training loops), one per model family
- :mod:`.utils`     — EMA, image IO, logging, metrics
"""

__version__ = "0.1.0"
