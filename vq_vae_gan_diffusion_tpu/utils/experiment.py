"""Experiment directory layout, logging, metric writing, checkpointing.

Reproduces the reference's run scaffolding as first-class features (SURVEY §2.2
"shared worker idioms"):

- timestamped run dirs ``log_dir/<dataset>/<model>/run_<ts>`` (train.py:50-53),
- config snapshot copied into the run dir (train.py:73-74),
- python logging to ``info.log`` + stdout (train.py:60-65),
- adaptive save_step heuristic (vqganVqvaeWorker.py:121-136 — the block the
  reference duplicates in 4 workers),
- structured metric writer (jsonl always; TensorBoard via tensorboardX when
  available) replacing the dormant Aim integration (train.py:253-256).

Checkpoints are Orbax trees {params, opt_state, ema, step, epoch, rng}
(SURVEY §5 checkpoint plan) — one format for every model family, unlike the
reference's per-worker ad-hoc ``torch.save`` flavors.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time
from typing import Any, Dict, Optional

import numpy as np


def create_run_dir(log_dir: str, dataset_name: str, model_name: str,
                   config_path: Optional[str] = None) -> str:
    ts = time.strftime("%Y-%m-%d-%H-%M-%S")
    run_dir = os.path.join(log_dir, dataset_name, model_name, f"run_{ts}")
    os.makedirs(run_dir, exist_ok=True)
    if config_path and os.path.exists(config_path):
        shutil.copy(config_path, os.path.join(run_dir, os.path.basename(config_path)))
    return run_dir


def setup_logging(run_dir: str, name: str = "vqgd") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(os.path.join(run_dir, "info.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


def adaptive_save_step(num_batches: int) -> int:
    """Reference heuristic (vqganVqvaeWorker.py:121-136): scale artifact cadence
    with epoch length."""
    if num_batches > 1000:
        return 500
    if num_batches > 500:
        return 250
    if num_batches > 100:
        return 50
    if num_batches > 10:
        return 5
    return 2


class MetricWriter:
    """jsonl metrics + optional TensorBoard, one interface (SURVEY §5)."""

    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        # VQGD_NO_TB=1: measurement harnesses opt out — tensorboardX pulls in
        # torch + a multiprocessing writer thread, whose coexistence with
        # XLA:CPU produced flaky SIGSEGVs in the time-to-quality runs
        # (2026-08-20); jsonl metrics (pure python) always stay on
        if os.environ.get("VQGD_NO_TB"):
            use_tensorboard = False
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, Any]) -> None:
        clean = {}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = float(np.asarray(v).mean())
            clean[k] = v
        self._f.write(json.dumps({"step": int(step), **clean}) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in clean.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, int(step))

    def write_image(self, step: int, tag: str, img: np.ndarray) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, img, int(step), dataformats="HWC")

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


# ---------------------------------------------------------------------------
# Orbax checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, step: int, tree: Any, keep: int = 3) -> None:
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(tree))


def restore_checkpoint(ckpt_dir: str, target: Any = None,
                       step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        if target is not None:
            return mgr.restore(step, args=ocp.args.StandardRestore(target))
        return mgr.restore(step)


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp
    if not os.path.isdir(ckpt_dir):
        return None
    try:
        with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
            return mgr.latest_step()
    except Exception:
        return None
