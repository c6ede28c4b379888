"""Exponential moving averages over parameter pytrees.

Replaces the reference's three EMA flavors (SURVEY §2.6/§2.2):

- torchvision ``AveragedModel`` subclass with batch-adjusted decay
  (utils.py:135-146, gaussianDiffusion3DWorker.py:63-66),
- ``ema_pytorch.EMA`` (gaussianDiffusion2DWorker.py:150-154),
- shadow-dict EMA with apply/restore (gaussian_diffusion.py:26-51),

with one functional pytree transform usable inside a jitted train step:
``ema = decay * ema + (1 - decay) * params``.
"""

from __future__ import annotations

from typing import Any

import jax


def ema_update(ema_params: Any, params: Any, decay: float | jax.Array) -> Any:
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), ema_params, params)


def adjusted_decay(base_decay: float, batch_size: int, num_samples: int,
                   ema_steps: int, epochs: int) -> float:
    """Batch-size-adjusted decay, reference gaussianDiffusion3DWorker.py:63-66:
    ``adjust = batch_size * model_ema_steps / epochs``; decay = 1-(1-d)·adjust,
    clamped to [0, 1)."""
    adjust = batch_size * ema_steps / max(epochs, 1)
    d = 1.0 - (1.0 - base_decay) * adjust
    return min(max(d, 0.0), 0.999999)
