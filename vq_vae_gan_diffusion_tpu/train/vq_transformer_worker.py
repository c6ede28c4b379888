"""Stage-2 autoregressive worker (reference ``worker/vqTransformerWorker.py``).

- Cross-entropy on next-token logits over pkeep-corrupted inputs
  (vqTransformerWorker.py:135-148);
- AdamW(lr, β=(0.9, 0.95)) with the minGPT decay/no-decay split — weight decay
  0.01 on dense kernels only; biases, LayerNorm, embeddings and pos_emb exempt
  (vqTransformerWorker.py:94-133). Implemented with an optax mask;
- per-save_step ``log_images`` grids (rec / half / full samples);
- checkpoints save the transformer (+ frozen VQVAE params for convenience).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config
from ..models.vq_transformer import VQTransformer
from ..utils import make_grid, save_image
from .base import BaseWorker, maybe_accumulate


class TransformerState(struct.PyTreeNode):
    gpt_params: Any
    vq_params: Any          # frozen
    opt_state: Any
    step: jax.Array


def mingpt_decay_mask(params) -> Any:
    """True (decay) for 2D dense kernels; False for biases/norms/embeddings/pos_emb."""
    def mask_fn(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if "pos_emb" in names or "embedding" in names:
            return False
        return names[-1] == "kernel" and leaf.ndim == 2
    return jax.tree_util.tree_map_with_path(mask_fn, params)


class VQTransformerWorker(BaseWorker):
    def __init__(self, config: Config, run_dir: str, logger=None, mesh=None,
                 debug: bool = False, seed: int = 0, save_ckpt_dir=None,
                 dtype=jnp.float32):
        super().__init__(config, run_dir, logger, mesh, debug, seed, save_ckpt_dir)
        self.model_name = config.architecture.model_name
        self.composite = VQTransformer(config, dtype=dtype)
        key = (self.model_name if self.model_name in config.trainer
               else "vqvae_transformer")
        tr = config.trainer[key]
        lr = float(tr.learning_rate)
        b1, b2 = float(tr.get("beta1", 0.9)), float(tr.get("beta2", 0.95))
        self.opt = maybe_accumulate(
            optax.adamw(lr, b1=b1, b2=b2, weight_decay=0.01,
                        mask=mingpt_decay_mask), tr)
        self.param_sharding_mode = str(
            tr.get("param_sharding", config.trainer.get("param_sharding",
                                                        "replicated")))
        composite, opt = self.composite, self.opt

        @jax.jit
        def train_step(state: TransformerState, imgs: jax.Array, rng: jax.Array):
            def loss_fn(gpt_params):
                logits, targets = composite.forward(gpt_params, state.vq_params,
                                                    imgs, rng)
                logits = logits.astype(jnp.float32)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits.reshape(-1, logits.shape[-1]), targets.reshape(-1)).mean()
                acc = jnp.mean(jnp.argmax(logits, -1) == targets)
                return loss, dict(ce_loss=loss, token_accuracy=acc)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.gpt_params)
            updates, new_opt = opt.update(grads, state.opt_state, state.gpt_params)
            new_params = optax.apply_updates(state.gpt_params, updates)
            return state.replace(gpt_params=new_params, opt_state=new_opt,
                                 step=state.step + 1), aux

        self._train_step = train_step
        self._sample = jax.jit(
            lambda gpt_params, rng, batch: composite.sample(gpt_params, rng, batch),
            static_argnums=(2,))

    def init_state(self) -> TransformerState:
        rng = jax.random.PRNGKey(self.seed)
        vq = self.composite.vqvae
        dummy = jnp.zeros((1, vq.img_size, vq.img_size, vq.img_channels), jnp.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            vq_params = vq.init(rng, dummy)["params"]
        vq_params = jax.device_put(vq_params, jax.devices()[0])
        # resume frozen stage-1 weights (reference resume_path semantics)
        resume = self.config.architecture.vqvae.get("resume_path")
        if resume and os.path.exists(str(resume)):
            from ..utils import restore_checkpoint
            tree = restore_checkpoint(str(resume))
            try:
                vq_params = tree["state"]["vqvae_params"]
                self.logger.info("frozen VQVAE restored from %s", resume)
            except (KeyError, TypeError):
                self.logger.warning("could not extract vqvae_params from %s", resume)
        dummy_idx = jnp.zeros((1, self.composite.seq_len), jnp.int32)
        with jax.default_device(jax.devices("cpu")[0]):
            gpt_params = self.composite.gpt.init(rng, dummy_idx)["params"]
        gpt_params = jax.device_put(gpt_params, jax.devices()[0])
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(gpt_params))
        self.logger.info("GPT params: %.1fM", n / 1e6)
        return TransformerState(gpt_params=gpt_params, vq_params=vq_params,
                                opt_state=self.opt.init(gpt_params),
                                step=jnp.zeros((), jnp.int32))

    def place_on_mesh(self) -> None:
        """GPT params follow ``trainer.<model>.param_sharding``
        (replicated | tp | fsdp | tp_fsdp); the frozen VQVAE stays replicated.
        Optimizer moments mirror the param tree (their leaf paths carry the
        param path as a suffix), so the same rules shard them identically —
        sharding propagation can't do it (opt.init's zeros_like has no
        dataflow dependency on the params)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import apply_param_sharding, resolve_sharding_rules

        rules = resolve_sharding_rules(self.param_sharding_mode, self.mesh)
        if rules is None:
            super().place_on_mesh()
            return
        repl = NamedSharding(self.mesh, P())
        gpt_params = apply_param_sharding(self.state.gpt_params, self.mesh, rules)
        self.state = self.state.replace(
            gpt_params=gpt_params,
            vq_params=jax.device_put(self.state.vq_params, repl),
            opt_state=apply_param_sharding(self.state.opt_state, self.mesh, rules),
            step=jax.device_put(self.state.step, repl))
        self.rng = jax.device_put(self.rng, repl)

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    def log_artifacts(self, batch, epoch: int, index: int) -> None:
        # device-side compute only; readback batched per epoch, file/TB
        # writes on the IO thread (BaseWorker.queue_artifact)
        logs = self.composite.log_images(self.state.gpt_params, self.state.vq_params,
                                         jnp.asarray(batch[:4]), self.next_rng())
        step = self.global_step

        def write(fetched):
            rows = [self.to_uint8(fetched[k])
                    for k in ("input", "rec", "half_sample", "full_sample")]
            grid = make_grid(np.concatenate(rows, axis=0), nrow=4)
            save_image(grid, os.path.join(self.run_dir,
                                          f"transformer_epoch{epoch}_{index}.jpg"))
            self.metrics.write_image(step, "samples", grid)
        self.queue_artifact(logs, write)

    def generate_images(self, val_loader=None, n_samples: int = 16, epoch: int = 0):
        indices = self._sample(self.state.gpt_params, self.next_rng(), n_samples)
        imgs = self.jit_cached("z2i", self.composite.z_to_image)(
            self.state.vq_params, indices)
        save_image(make_grid(self.to_uint8(np.asarray(imgs)), nrow=4),
                   os.path.join(self.run_dir, f"samples_epoch{epoch}.jpg"))
