"""torch.optim.lr_scheduler.OneCycleLR reproduced exactly (lr AND momentum).

The reference pairs AdamW with ``OneCycleLR(opt, lr, total_steps,
pct_start=0.25, anneal_strategy='cos')`` in both diffusion workers
(gaussianDiffusion3DWorker.py:94-97, vqdiffusionWorker.py:120-122). Two
details matter beyond optax's ``cosine_onecycle_schedule``:

1. **Phase boundaries.** torch anneals over ``pct_start·total − 1`` steps up
   and ``total − pct_start·total`` steps down (the −1 comes from
   ``last_epoch`` starting at 0); optax uses plain step fractions, so its lr
   differs by O(peak/total) every step — visible in short runs.
2. **Momentum cycling.** torch's default ``cycle_momentum=True`` drives Adam's
   β₁ from ``max_momentum=0.95`` → ``base_momentum=0.85`` → 0.95 inverse to
   the lr — SILENTLY OVERRIDING the β₁ passed to AdamW. The reference
   vqdiffusionWorker configures ``betas=(0.65, 0.95)`` and then never trains
   with β₁=0.65: OneCycleLR replaces it from step 0. We reproduce that quirk
   (the configured beta1 is likewise ignored when the schedule is active).

Use with ``optax.inject_hyperparams(optax.adamw)(learning_rate=lr_fn,
b1=momentum_fn, ...)``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp


def _annealing_cos(start: float, end: float, pct):
    """torch OneCycleLR._annealing_cos: cosine from start to end as pct 0→1."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def torch_onecycle_schedules(
    total_steps: int,
    peak_lr: float,
    pct_start: float = 0.25,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
) -> Tuple[Callable, Callable]:
    """Returns (lr_schedule, beta1_schedule), both step-count → value.

    Matches torch semantics where ``scheduler.step()`` runs after each
    ``optimizer.step()``: update k uses ``last_epoch = k``.
    """
    total_steps = int(total_steps)
    if pct_start * total_steps <= 1.0:
        # with up_end <= 0 torch puts every step in the down phase; the clamp
        # below would instead hold step 0 at initial_lr — a silent ~25×
        # discrepancy. All shipped workers floor total_steps well above this.
        raise ValueError(
            f"total_steps={total_steps} too small for pct_start={pct_start}: "
            "torch-exactness needs pct_start*total_steps > 1")
    initial_lr = peak_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch phase ends (three_phase=False): [0, up_end] then (up_end, total-1]
    up_end = float(pct_start * total_steps) - 1.0
    down_len = max(float(total_steps - 1) - up_end, 1e-6)

    def _interp(step, start_a, end_a, start_b, end_b):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / up_end, 0.0, 1.0)
        pct_down = jnp.clip((step - up_end) / down_len, 0.0, 1.0)
        return jnp.where(step <= up_end,
                         _annealing_cos(start_a, end_a, pct_up),
                         _annealing_cos(start_b, end_b, pct_down))

    def lr_fn(step):
        return _interp(step, initial_lr, peak_lr, peak_lr, min_lr)

    def b1_fn(step):
        return _interp(step, max_momentum, base_momentum,
                       base_momentum, max_momentum)

    return lr_fn, b1_fn
