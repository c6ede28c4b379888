#!/usr/bin/env python
"""Benchmark: MNIST-class VQGAN training throughput (images/sec/chip).

The flagship workload from BASELINE.md — stage-1 VQGAN training (conv
encoder/decoder + codebook quantization + LPIPS + PatchGAN + adaptive-λ
double-VJP + two Adam optimizers), the reference's hot loop
(vqganVqvaeWorker.py:163-254). One jitted step, batch 200 @ 28×28×1 as in the
reference mnist config (training_config_small.yml:93).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline``: the reference publishes no benchmarks (BASELINE.json
``published: {}``). We anchor against the same train step implemented in the
reference's PyTorch stack measured on this host's CPU when
``baselines/torch_cpu_reference.json`` exists (see
tools/measure_torch_baseline.py); otherwise against the first TPU measurement
recorded in ``baselines/first_tpu.json`` (self-relative speedup); 1.0 on the
very first run.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

BATCH = 200
IMG = 28
WARMUP = 3
ITERS = 100  # scan length; fixed dispatch cost amortizes to <0.3 ms/step

# Driver-timeout proofing: the round-2 driver killed bench.py (rc=124) while
# it was still inside its degradation-wait loop, leaving no parseable JSON at
# all (BENCH_r02.json). Rules now:
#   1. the carry-forward outage line is printed the moment degradation is
#      first detected (then we keep waiting; a later live measurement line
#      overwrites it — the driver parses the LAST JSON line on stdout);
#   2. a SIGTERM/SIGINT handler prints the outage line if nothing has been
#      printed yet, so even a kill during the very first probe leaves a
#      parseable record.
_EMITTED_FINAL = False  # a real measurement line was printed
_EMITTED_OUTAGE = False


def _outage_line(reason: str, extra: dict | None = None) -> str:
    last = {}
    try:
        import re
        txt = open(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "BENCHMARKS.md")).read()
        m = re.search(r'"images_per_sec":\s*([0-9.]+)', txt)
        if m:
            last = {"last_measured_images_per_sec": float(m.group(1)),
                    "last_measured_note": "from BENCHMARKS.md (pre-outage run)"}
    except OSError:
        pass
    return json.dumps({
        "metric": "vqgan_mnist_train_images_per_sec_per_chip",
        "value": 0.0, "unit": "images/s/chip", "vs_baseline": 0.0,
        "error": reason, **last, **(extra or {})})


def _emit_outage(reason: str, extra: dict | None = None) -> None:
    global _EMITTED_OUTAGE
    print(_outage_line(reason, extra), flush=True)
    _EMITTED_OUTAGE = True


def _install_term_handler() -> None:
    def _handler(signum, frame):
        if not _EMITTED_FINAL and not _EMITTED_OUTAGE:
            # async-signal-safe path: print() on buffered stdout can raise
            # "reentrant call" if the signal lands mid-write; os.write of a
            # pre-built bytes line cannot
            line = _outage_line(
                f"killed by signal {signum} before a measurement completed "
                "(tpu tunnel presumed wedged)")
            try:
                os.write(1, ("\n" + line + "\n").encode())
            except OSError:
                pass
        # re-raise default behaviour so the exit code reflects the kill
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _handler)
        except (ValueError, OSError):
            pass  # non-main thread / restricted env


def build():
    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    cfg = load_config(os.path.join(os.path.dirname(__file__),
                                   "configs", "training_config_mnist.yml"))
    cfg = cfg.replace_path("trainer.log_dir", "/tmp/vqgd_bench")
    worker = VQGANVQVAEWorker(cfg, "/tmp/vqgd_bench/run", debug=True,
                              dtype=jnp.bfloat16)
    state = worker.init_state()
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (BATCH, IMG, IMG, 1), jnp.float32)
    return worker, state, imgs, rng


# Canonical probe (tools/_tpu_probe.py): times the matmul chain with an
# O(1)-byte on-device-reduced readback. The old inline probe fetched the full
# 32 MB result inside the timed region, so its reading was bounded by tunnel
# bandwidth, not chip health — it was never observed passing its own bar on
# healthy hardware and could have deadlocked the health gate forever.
_PROBE_SRC = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tools", "_tpu_probe.py")).read()
# Single source of truth for the bar: tools/_tpu_probe.py (jax is only
# imported inside measure(), so importing the module here is hang-safe).
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from _tpu_probe import DEFAULT_BAR_TFLOPS as _HEALTHY_TFLOPS  # noqa: E402


def _wait_for_healthy_device(max_wait_s: float = 3300.0) -> float:
    """The axon tunnel occasionally degrades for ~20-30 min — observed >26 h
    (throughput drops ~50x; it recovers on its own). In a FULL wedge even
    `import jax`/device init can hang, so each probe runs in a SUBPROCESS
    with a timeout; the main process only touches the TPU after a probe
    succeeds. Returns the last probed TFLOP/s.

    The carry-forward outage JSON is printed as soon as the FIRST probe comes
    back degraded (driver-timeout proofing, see module docstring) — a later
    live measurement simply prints another line and the driver parses the
    last one."""
    import subprocess

    deadline = time.time() + max_wait_s
    tf = 0.0
    while True:
        try:
            out = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                                 capture_output=True, text=True, timeout=300)
            tf = float(out.stdout.strip().splitlines()[-1])
        except (subprocess.TimeoutExpired, ValueError, IndexError):
            tf = 0.0
        if tf > _HEALTHY_TFLOPS or time.time() > deadline:
            return tf
        if not _EMITTED_OUTAGE:
            _emit_outage(f"tpu degraded ({tf:.1f} TFLOP/s at first probe); "
                         "still waiting for recovery — this line is the "
                         "carry-forward record in case the driver times out")
        print(f"# device degraded ({tf:.0f} TFLOP/s), waiting...",
              file=sys.stderr, flush=True)
        time.sleep(60)


_BACKEND_SRC = "import jax; print(jax.default_backend())"


def main() -> int:
    global _EMITTED_FINAL
    _install_term_handler()
    # Probe BEFORE importing jax in this process: in a full tunnel wedge
    # even `import jax` (axon plugin discovery) can hang, and only a
    # subprocess can be abandoned on timeout.
    import subprocess
    backend = ""
    try:
        backend = subprocess.run(
            [sys.executable, "-c", _BACKEND_SRC], capture_output=True,
            text=True, timeout=300).stdout.strip()
    except subprocess.TimeoutExpired:
        if not _EMITTED_OUTAGE:
            _emit_outage("tpu tunnel fully wedged (backend probe timed out); "
                         "waiting for recovery")
    if backend != "cpu":
        tf = _wait_for_healthy_device()
        if tf == 0.0:
            # the tunnel never answered a single probe: importing jax here
            # would hang the driver — the outage line was already emitted by
            # the wait loop (or the probe above); nothing further is safe.
            if not _EMITTED_OUTAGE:
                _emit_outage("tpu tunnel unreachable for the whole wait window")
            return 1
        if tf <= _HEALTHY_TFLOPS:
            # wait window expired with the chip alive but DEGRADED (the
            # ~2 TFLOP/s mode): a measurement now would print a mirage-low
            # number as the last JSON line and override the carry-forward
            # record. Refuse to measure; refresh the outage line with the
            # final probe so the record says exactly what happened.
            _emit_outage(f"recovery window expired with the chip still "
                         f"degraded ({tf:.1f} TFLOP/s); refusing to record a "
                         "degraded-mode measurement")
            return 1

    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    worker, state, imgs, rng = build()
    n_chips = jax.local_device_count()

    import numpy as np

    # warmup: covers both compile variants (fresh uncommitted args, then
    # committed jit outputs). NOTE: block_until_ready does not actually fence
    # on the axon backend — a host readback is the only reliable sync.
    for i in range(WARMUP):
        state, metrics = worker.train_step(state, imgs, jax.random.fold_in(rng, i))
        float(np.asarray(metrics["vq_loss"]))

    # measured path: the device-side multi-step loop (train/base.py
    # train_multi_step — lax.scan over ITERS steps, one dispatch), i.e. the
    # same path train.py uses with trainer.steps_per_dispatch=ITERS. Per-call
    # dispatch overhead on tunneled backends scales with pytree leaf count
    # (~60 µs/leaf × 891 leaves ≈ 13 ms — more than the step's compute), so
    # per-step dispatch would measure the tunnel, not the TPU.
    batches = jnp.broadcast_to(imgs, (ITERS,) + imgs.shape)
    rngs = jax.random.split(jax.random.fold_in(rng, 777), ITERS)
    state, metrics = worker.train_multi_step(state, batches, rngs)  # compile
    float(np.asarray(metrics["vq_loss"]))

    # Min over several windows: the axon tunnel can stall for MINUTES and
    # recover mid-process — a single timed window that straddles a stall
    # records a mirage (observed 2026-08-21: 44 img/s with healthy probes on
    # both sides of the run). A transient stall cannot make a window FASTER,
    # so min-of-3 is robust; a healthy window costs ~1.2 s, so the retry is
    # nearly free.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = worker.train_multi_step(state, batches, rngs)
        float(np.asarray(metrics["vq_loss"]))  # sync
        times.append(time.perf_counter() - t0)
    dt = min(times)

    ips = BATCH * ITERS / dt / n_chips

    if backend != "cpu":
        # the chip can degrade MID-measurement (the window that opened the
        # wait loop can close any time): re-probe before trusting the number.
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from _tpu_probe import measure as _probe_measure
        tf_post = _probe_measure()
        if tf_post <= _HEALTHY_TFLOPS:
            _emit_outage(
                f"chip degraded during/after the measurement (post-probe "
                f"{tf_post:.1f} TFLOP/s) — the measured rate is not trustworthy",
                extra={"suspect_images_per_sec": round(ips, 2)})
            return 1
    base_dir = os.path.join(os.path.dirname(__file__), "baselines")
    os.makedirs(base_dir, exist_ok=True)
    vs = 1.0
    torch_file = os.path.join(base_dir, "torch_cpu_reference.json")
    first_file = os.path.join(base_dir, "first_tpu.json")
    if os.path.exists(torch_file):
        ref = json.load(open(torch_file)).get("images_per_sec", 0)
        if ref > 0:
            vs = ips / ref
    elif os.path.exists(first_file):
        ref = json.load(open(first_file)).get("images_per_sec", 0)
        if ref > 0:
            vs = ips / ref
    else:
        with open(first_file, "w") as f:
            json.dump({"images_per_sec": ips, "batch": BATCH,
                       "backend": jax.default_backend()}, f)

    # set the flag BEFORE printing: a SIGTERM landing during the print must
    # not append an outage line after a completed measurement (the driver
    # parses the last JSON line)
    _EMITTED_FINAL = True
    print(json.dumps({
        "metric": "vqgan_mnist_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(vs, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
