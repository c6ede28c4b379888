"""VQ-Transformer: frozen VQVAE + GPT prior over codebook indices.

Parity with reference ``network/vqTransformer/vqTransformer.py``:

- ``encode_to_z``: frozen VQVAE encode → flat indices [B, T] (:64-81);
- ``z_to_image``: codebook lookup → latent grid → decode (:83-103; the
  reference hardcodes a 16×16×256 grid — we derive it from the VQVAE config);
- training forward (:105-154): bernoulli(pkeep) token corruption with random
  replacements, SOS prepend, next-token logits against the *original* indices;
- sampling (:173-216): temperature + top-k(100) categorical — here a KV-cached
  ``lax.scan`` (see :func:`.mingpt.sample_tokens`);
- ``log_images`` (:218-250): reconstruction, half-prefix completion, full
  sample.

This is a *functional composite*: it holds module definitions; params are
passed explicitly (vqvae params are stop-gradiented — the JAX equivalent of
the reference's requires_grad=False freeze, vqvae.py:96-113).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from .mingpt import GPT, sample_tokens
from .vqvae import VQVAE


class VQTransformer:
    def __init__(self, cfg: Config, dtype=jnp.float32):
        model_name = cfg.architecture.model_name
        key = model_name if model_name in cfg.architecture else "vqvae_transformer"
        tcfg = cfg.architecture[key]
        self.sos_token = int(tcfg.sos_token)
        self.pkeep = float(tcfg.pkeep)
        self.vocab_size = int(cfg.architecture.vqvae.num_codebook_vectors)
        self.vqvae = VQVAE.from_config(cfg, dtype=dtype)
        self.gpt = GPT(
            vocab_size=self.vocab_size,
            block_size=int(tcfg.block_size),
            n_layer=int(tcfg.n_layer),
            n_head=int(tcfg.n_head),
            n_embd=int(tcfg.n_embd),
            dtype=dtype,
            remat=bool(tcfg.get("remat", False)),
        )
        self.seq_len = self.vqvae.latent_size ** 2
        # opt-in quantized weight streaming for the fused decode kernel
        # (architecture.<model>.decode_quant: int8|int8kv|int4|int4kv) —
        # sampling only; training and teacher-forced forwards stay full
        # precision
        self.decode_quant = tcfg.get("decode_quant", None)

    # -- pure functions (take params explicitly) ----------------------------
    def encode_to_z(self, vq_params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        z_q, indices, _ = self.vqvae.apply({"params": vq_params}, x,
                                           method=VQVAE.encode)
        b = x.shape[0]
        return jax.lax.stop_gradient(z_q), jax.lax.stop_gradient(indices.reshape(b, -1))

    def z_to_image(self, vq_params, indices: jax.Array) -> jax.Array:
        return self.vqvae.apply({"params": vq_params}, indices,
                                method=VQVAE.decode_indices)

    def forward(self, gpt_params, vq_params, x: jax.Array, rng: jax.Array,
                *, deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        """Training forward: returns (logits [B,T,V], target indices [B,T])."""
        _, indices = self.encode_to_z(vq_params, x)
        b, t = indices.shape
        rng_mask, rng_rand, rng_drop = jax.random.split(rng, 3)
        keep = jax.random.bernoulli(rng_mask, self.pkeep, (b, t)).astype(indices.dtype)
        random_indices = jax.random.randint(rng_rand, (b, t), 0, self.vocab_size,
                                            indices.dtype)
        new_indices = keep * indices + (1 - keep) * random_indices
        sos = jnp.full((b, 1), self.sos_token, indices.dtype)
        new_indices = jnp.concatenate([sos, new_indices], axis=1)
        logits = self.gpt.apply({"params": gpt_params}, new_indices[:, :-1],
                                deterministic=deterministic,
                                rngs={"dropout": rng_drop} if not deterministic else {})
        return logits, indices

    def sample(self, gpt_params, rng: jax.Array, batch: int,
               start_indices: Optional[jax.Array] = None, steps: Optional[int] = None,
               temperature: float = 1.0, top_k: int = 100) -> jax.Array:
        """Sample `steps` new indices after (SOS [+ start_indices])."""
        sos = jnp.full((batch, 1), self.sos_token, jnp.int32)
        prefix = sos if start_indices is None else jnp.concatenate(
            [sos, start_indices.astype(jnp.int32)], axis=1)
        steps = steps if steps is not None else self.seq_len
        return sample_tokens(self.gpt, gpt_params, rng, prefix, prefix.shape[1],
                             steps, temperature, top_k,
                             quant=self.decode_quant)

    def log_images(self, gpt_params, vq_params, x: jax.Array, rng: jax.Array
                   ) -> Dict[str, jax.Array]:
        _, indices = self.encode_to_z(vq_params, x)
        b, t = indices.shape
        r1, r2 = jax.random.split(rng)
        half = indices[:, : t // 2]
        half_new = self.sample(gpt_params, r1, b, start_indices=half, steps=t - t // 2)
        half_sample = self.z_to_image(vq_params, jnp.concatenate([half, half_new], axis=1))
        full = self.sample(gpt_params, r2, b, steps=t)
        full_sample = self.z_to_image(vq_params, full)
        rec = self.z_to_image(vq_params, indices)
        return {"input": x, "rec": rec, "half_sample": half_sample,
                "full_sample": full_sample}
