"""VQ-Diffusion composite: frozen VQVAE + one of three diffusion priors.

Parity with reference ``network/vqDiffusion/vqDiffusion.py:18-239``:

- prior dispatch on ``diffusion_type`` ∈ {VQ_Official, gaussiandiffusion2d,
  gaussiandiffusion3d} with the same U-Net channel math (:55-124);
- ``forward`` = frozen encode_to_z → prior loss (:180-193); ``sample``
  (:195-210); ``log_images`` (:218-239);
- the reference uses ``latent_channels`` as the token sequence length
  (:28 — works only because 16² = 256 = latent_channels); we use the actual
  ``latent_size²`` and document the divergence (SURVEY §5 config quirk #2).

Layout adapters: the torch priors feed Conv1d/Conv2d with [B, C, L] /
[B, C, H, W]; our U-Nets are channels-last, so each ``model_fn`` closure
transposes at the boundary, keeping the *process* arrays in the reference's
layout so the math ports 1:1.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..diffusion.discrete import DiscreteDiffusion, LtState
from ..diffusion.gaussian2d import GaussianDiffusion2D, GaussianDiffusion2DConfig
from ..diffusion.gaussian3d import VQGaussianDiffusion3D
from .unet1d import Unet1D
from .unet_shuffle import ShuffleUNet
from .vqvae import VQVAE


class VQDiffusionComposite:
    def __init__(self, cfg: Config, dtype=jnp.float32):
        model_name = cfg.architecture.model_name
        dcfg = cfg.architecture[model_name if model_name in cfg.architecture
                                else "vqdiffusion"]
        self.vqvae = VQVAE.from_config(cfg, dtype=dtype)
        self.seq_len = self.vqvae.latent_size ** 2
        self.codebook_size = int(cfg.architecture.vqvae.num_codebook_vectors)
        self.diffusion_type = str(dcfg.diffusion_type)
        self.timesteps = int(dcfg.diffusion_steps)
        self.sampling_timesteps = int(dcfg.sampling_steps)
        self.gaussian_dim = int(dcfg.gaussian_dim)
        self.distribute_dim = int(dcfg.distribute_dim)
        self.indices_to_dist_fn = str(dcfg.indices_to_dist_fn)
        self.unet_dim = int(dcfg.get("unet_dim", 3))
        self.sample_method = str(dcfg.get("sample_method", "ddpm"))
        self.loss_fn_name = str(dcfg.get("loss_fn", "noise_mse"))
        self.return_all_timestamps = bool(dcfg.get("return_all_timestamps", False))
        self.clipped_reverse_diffusion = bool(dcfg.get("clipped_reverse_diffusion", True))
        self.compute_indices_recon_loss = bool(dcfg.get("compute_indices_recon_loss", False))
        self.dtype = dtype
        # inference fast path for ShuffleUNet priors: BN-folded shift-add
        # forward (models/shuffle_infer.py) — 2.1× the flax module in the
        # 1000-step sampling scan; "pallas" selects the fused VMEM kernel
        self.fused_sampler = dcfg.get("fused_sampler", True)

        K, N = self.codebook_size, self.seq_len
        # the reference hardcodes base dim 64 / mults (1,2,4,8) for every
        # prior U-Net (vqDiffusion.py:58-72); these knobs default to that but
        # let tiny CI/dryrun configs shrink the compile
        ubase = int(dcfg.get("unet_base_dim", 64))
        umults = tuple(dcfg.get("unet_dim_mults", (1, 2, 4, 8)))
        if self.diffusion_type == "VQ_Official":
            if self.unet_dim == 2:
                # Conv1d over length N with K channels in / K-1 out (:58-65)
                self.unet = Unet1D(dim=ubase, dim_mults=umults, channels=K,
                                   out_dim=K - 1, dtype=dtype)
                self._unet_kind = "1d"
            else:
                # Conv2d over the [K, N] log-onehot "image", 1 channel (:66-72)
                self.unet = ShuffleUNet(self.timesteps, 256, 1, 1, 64,
                                        (1, 2, 4, 8), dtype=dtype)
                self._unet_kind = "2d"
            self.prior = DiscreteDiffusion(
                num_classes=K, seq_len=N, timesteps=self.timesteps,
                sampling_timesteps=self.sampling_timesteps)
            # fuse posterior+gumbel-sample into one Pallas launch per reverse
            # step (ops/discrete_posterior_pallas.py; token-identical).
            # Default ON on TPU only: the measured winner on this chain (42.2
            # vs 41.5 steps/s healthy-window, BENCHMARKS.md 2026-08-21). On
            # CPU the kernel would run interpreted (token-identical,
            # discrete.py:305-309) but much slower than XLA, so CPU runs
            # default to the XLA path unless explicitly requested.
            import jax as _jax
            self.prior.fused_posterior = dcfg.get(
                "fused_posterior", _jax.default_backend() == "tpu")
        elif self.diffusion_type == "gaussiandiffusion2d":
            if self.indices_to_dist_fn == "one_hot":
                ch = K if self.distribute_dim == 1 else N
            else:
                ch = self.gaussian_dim if self.distribute_dim == 1 else N
            self.unet = Unet1D(dim=ubase, dim_mults=umults, channels=ch,
                               out_dim=ch, dtype=dtype)
            self._unet_kind = "1d"
            self.prior = GaussianDiffusion2D(
                GaussianDiffusion2DConfig(
                    seq_length=N, timesteps=self.timesteps,
                    sampling_timesteps=self.sampling_timesteps,
                    vocab_size=K, distribute_dim=self.distribute_dim,
                    gaussian_dim=self.gaussian_dim,
                    indices_to_dist_fn=self.indices_to_dist_fn,
                    diffusion_type="vqdiffusion"),
                model_fn=None)
        elif self.diffusion_type == "gaussiandiffusion3d":
            assert self.distribute_dim == -1
            self.unet = ShuffleUNet(self.timesteps, 256, 1, 1,
                                    int(dcfg.get("base_dim", ubase)), umults,
                                    dtype=dtype)
            self._unet_kind = "2d"
            self.prior = VQGaussianDiffusion3D(
                seq_length=N, timesteps=self.timesteps,
                sampling_timesteps=self.sampling_timesteps, vocab_size=K,
                gaussian_dim=self.gaussian_dim,
                sample_method=self.sample_method, loss_fn=self.loss_fn_name,
                return_all_timestamps=self.return_all_timestamps,
                clipped_reverse_diffusion=self.clipped_reverse_diffusion,
                compute_indices_recon_loss=self.compute_indices_recon_loss)
        else:
            raise ValueError(f"diffusion_type {self.diffusion_type!r} not supported")

    # -- model_fn adapters (torch [B,C,L]/[B,C,H,W] ↔ our channels-last) -----
    def _bind(self, unet_params, batch_stats=None, train: bool = False):
        """Returns model_fn closures adapted per prior. For BatchNorm U-Nets in
        train mode, collects the updated stats into self._new_stats."""
        self._new_stats = batch_stats

        if self.diffusion_type == "VQ_Official":
            if self._unet_kind == "1d":
                def model_fn(log_x_t, t):
                    # [B, N, K] class-last → torch [B, K, N] → flax [B, N, K]
                    out = self.unet.apply({"params": unet_params}, log_x_t,
                                          None, t)
                    return out  # [B, N, K-1]
            else:
                shuffle_fwd = self._shuffle_fwd(unet_params, batch_stats, train)

                def model_fn(log_x_t, t):
                    x = jnp.swapaxes(log_x_t, 1, 2)[..., None]  # [B, K, N, 1]
                    out = shuffle_fwd(x, t)
                    out = out[..., 0]                      # [B, K, N]
                    return jnp.swapaxes(out[:, :-1, :], 1, 2)  # [B, N, K-1]
            return model_fn

        if self.diffusion_type == "gaussiandiffusion2d":
            def model_fn(x, self_cond, t):
                # torch treats axis-1 as channels; flax wants channels last
                xt = jnp.swapaxes(x, 1, 2)
                sc = jnp.swapaxes(self_cond, 1, 2) if self_cond is not None else None
                out = self.unet.apply({"params": unet_params}, xt, sc, t)
                return jnp.swapaxes(out, 1, 2)
            return model_fn

        # gaussiandiffusion3d: state [B, N, D, 1] is already NHWC
        shuffle_fwd = self._shuffle_fwd(unet_params, batch_stats, train)

        def model_fn(x, self_cond, t):
            return shuffle_fwd(x, t)
        return model_fn

    def _shuffle_fwd(self, unet_params, batch_stats, train: bool):
        """Forward for the ShuffleUNet priors. Training keeps the flax module
        (mutable BatchNorm stats); inference uses the BN-folded fast path
        unless ``fused_sampler`` is falsy."""
        if train:
            def fwd(x, t):
                variables = {"params": unet_params,
                             "batch_stats": batch_stats or {}}
                out, upd = self.unet.apply(variables, x, None, t, train=True,
                                           mutable=["batch_stats"])
                self._new_stats = upd["batch_stats"]
                return out
            return fwd
        if self.fused_sampler:
            from .shuffle_infer import (apply_folded, fold_unet,
                                        resolve_sampler_mode)
            folded = fold_unet({"params": unet_params,
                                "batch_stats": batch_stats or {}},
                               dtype=self.dtype)
            use_pallas = resolve_sampler_mode(self.fused_sampler)

            def fwd(x, t):
                return apply_folded(folded, x, t, use_pallas=use_pallas,
                                    dtype=self.dtype).astype(x.dtype)
            return fwd

        def fwd(x, t):
            variables = {"params": unet_params,
                         "batch_stats": batch_stats or {}}
            return self.unet.apply(variables, x, None, t, train=False)
        return fwd

    # -- vqvae bridges --------------------------------------------------------
    def encode_to_z(self, vq_params, x: jax.Array) -> jax.Array:
        _, indices, _ = self.vqvae.apply({"params": vq_params}, x,
                                         method=VQVAE.encode)
        return jax.lax.stop_gradient(indices.reshape(x.shape[0], -1))

    def z_to_image(self, vq_params, indices: jax.Array) -> jax.Array:
        return self.vqvae.apply({"params": vq_params}, indices,
                                method=VQVAE.decode_indices)

    # -- loss / sample --------------------------------------------------------
    def loss(self, unet_params, vq_params, batch_stats, lt_state: Optional[LtState],
             x: jax.Array, rng: jax.Array):
        """→ (loss, metrics, new_batch_stats, new_lt_state)."""
        indices = self.encode_to_z(vq_params, x)
        model_fn = self._bind(unet_params, batch_stats, train=True)
        if self.diffusion_type == "VQ_Official":
            self.prior.model_fn = model_fn
            loss, metrics, new_lt = self.prior.train_loss(rng, indices, lt_state)
            return loss, metrics, self._new_stats, new_lt
        if self.diffusion_type == "gaussiandiffusion2d":
            self.prior.model_fn = model_fn
            loss = self.prior.loss(indices, rng)
            return loss, {"loss": loss}, self._new_stats, lt_state
        self.prior.diffusion.model_fn = model_fn
        loss, metrics = self.prior.loss(indices, rng)
        return loss, metrics, self._new_stats, lt_state

    def sample(self, unet_params, batch_stats, rng: jax.Array,
               batch_size: int = 1) -> jax.Array:
        model_fn = self._bind(unet_params, batch_stats, train=False)
        if self.diffusion_type == "VQ_Official":
            self.prior.model_fn = model_fn
            return self.prior.sample(rng, batch_size)
        if self.diffusion_type == "gaussiandiffusion2d":
            self.prior.model_fn = model_fn
            return self.prior.sample(rng, batch_size)
        self.prior.diffusion.model_fn = model_fn
        return self.prior.sample(rng, batch_size)

    def log_images(self, unet_params, vq_params, x: jax.Array
                   ) -> Dict[str, jax.Array]:
        x = x[:4]
        indices = self.encode_to_z(vq_params, x)
        rec = self.z_to_image(vq_params, indices)
        return {"input": x, "rec": rec}
