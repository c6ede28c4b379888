"""Driver-timeout proofing for bench.py (VERDICT r2 weak #1).

Round 2 ended with BENCH_r02.json ``parsed: null`` because the driver killed
bench.py (rc=124) while it was still waiting out a tunnel wedge. These tests
pin the two guarantees that prevent a repeat:

1. the carry-forward outage JSON line is printed as soon as the FIRST probe
   comes back degraded (not after the multi-minute recovery wait);
2. a SIGTERM arriving before any measurement still produces a parseable line
   (signal handler), even while blocked inside the backend probe.
"""

import json
import os
import re
import signal
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _json_lines(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_outage_line_emitted_on_first_degraded_probe(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_PROBE_SRC", "print(1.0)")  # 1 TFLOP/s
    monkeypatch.setattr(bench, "_EMITTED_OUTAGE", False)
    monkeypatch.setattr(bench, "_EMITTED_FINAL", False)

    class _Stop(Exception):
        pass

    def _no_sleep(s):
        # subprocess.run's wait loop uses tiny sleeps internally; only the
        # 60 s between-probe sleep marks the end of loop iteration one.
        if s >= 60:
            raise _Stop

    monkeypatch.setattr(bench.time, "sleep", _no_sleep)
    try:
        bench._wait_for_healthy_device(max_wait_s=3600.0)
    except _Stop:
        pass
    recs = _json_lines(capsys.readouterr().out)
    assert len(recs) == 1, "exactly one carry-forward line after probe #1"
    rec = recs[0]
    assert rec["metric"] == "vqgan_mnist_train_images_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "degraded" in rec["error"]
    # the carry-forward must reference the last real measurement
    assert rec.get("last_measured_images_per_sec", 0) > 0


def test_expired_window_still_degraded_refuses_to_measure(monkeypatch, capsys):
    # Deadline expiry with the chip alive-but-degraded (the ~2 TFLOP/s mode):
    # bench must NOT fall through and measure — a mirage-low number printed as
    # the last JSON line would override the carry-forward record.
    monkeypatch.setattr(bench, "_BACKEND_SRC", "print('axon')")
    monkeypatch.setattr(bench, "_EMITTED_OUTAGE", False)
    monkeypatch.setattr(bench, "_EMITTED_FINAL", False)
    monkeypatch.setattr(bench, "_wait_for_healthy_device",
                        lambda max_wait_s=3300.0: 2.3)
    rc = bench.main()
    assert rc == 1
    recs = _json_lines(capsys.readouterr().out)
    assert recs, "an outage line must be printed"
    rec = recs[-1]
    assert rec["value"] == 0.0
    assert "degraded" in rec["error"]
    assert rec.get("last_measured_images_per_sec", 0) > 0


def test_sigterm_during_backend_probe_still_prints_json(tmp_path):
    # Full-wedge simulation: the backend probe subprocess hangs; SIGTERM
    # arrives (driver timeout) while bench.main() is blocked on it.
    driver = tmp_path / "drive.py"
    driver.write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import bench
        bench._BACKEND_SRC = "import time; time.sleep(15)"
        bench._PROBE_SRC = "import time; time.sleep(15)"
        bench._install_term_handler()   # main() re-installs; harmless
        print("READY", flush=True)
        sys.exit(bench.main())
    """))
    p = subprocess.Popen([sys.executable, str(driver)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    # handshake instead of a fixed sleep: under a loaded machine interpreter
    # startup alone can exceed any guess
    line = p.stdout.readline()
    assert line.strip() == "READY", line
    time.sleep(0.5)  # let main() enter the backend-probe wait
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=30)
    recs = _json_lines(out)
    assert recs, "SIGTERM before any measurement must still leave a JSON line"
    rec = recs[-1]
    assert rec["metric"] == "vqgan_mnist_train_images_per_sec_per_chip"
    assert "error" in rec
    # killed by SIGTERM (negative returncode) — the handler re-raises
    assert p.returncode != 0

def test_probe_source_is_dash_c_safe_and_canonical():
    # bench.py executes tools/_tpu_probe.py's SOURCE via `python -c`, where
    # __file__ is undefined — the probe's __main__ block must tolerate that
    # (NameError fallback) or every health probe dies before printing and the
    # gate deadlocks. Also pin that bench._PROBE_SRC really is the canonical
    # probe file (single source of truth with tools/tpu_recovery_queue.sh).
    probe_path = os.path.join(REPO, "tools", "_tpu_probe.py")
    src = open(probe_path).read()
    assert bench._PROBE_SRC == src
    compile(src, "<probe>", "exec")          # syntactically valid
    assert "except NameError" in src          # __file__ fallback present
    # the timed readback must be a scalar, not the 32 MB result array:
    # chain() must end in an on-device reduction. Assert on the AST (not raw
    # text, which comments/docstrings could satisfy or break): somewhere in
    # measure() there is a call to *.sum (jnp.sum / lax reduction), and no
    # bare `.sum()` METHOD call on an array (Attribute call with args=[self]
    # pattern is indistinguishable — so instead require the jnp.sum form).
    import ast
    tree = ast.parse(src)
    measure_fn = next(n for n in ast.walk(tree)
                      if isinstance(n, ast.FunctionDef) and n.name == "measure")
    calls = [n for n in ast.walk(measure_fn) if isinstance(n, ast.Call)]
    def _is_mod_sum(c):  # jnp.sum(...) — module-qualified reduction
        f = c.func
        return (isinstance(f, ast.Attribute) and f.attr == "sum"
                and isinstance(f.value, ast.Name) and f.value.id == "jnp")
    def _is_method_sum(c):  # x.sum() — method form, banned in the probe
        f = c.func
        return (isinstance(f, ast.Attribute) and f.attr == "sum"
                and not isinstance(f.value, ast.Name))
    assert any(_is_mod_sum(c) for c in calls), "on-device jnp.sum reduction missing"
    assert not any(_is_method_sum(c) for c in calls)


def test_probe_bar_separates_observed_modes():
    # Degraded tunnel mode reads ~0-3 TFLOP/s on the probe chain; the bar
    # must clear it by an order of magnitude but stay below any plausible
    # healthy 4096^2-bf16-matmul reading (>70). 45 was chosen; pin the range
    # so a future edit can't silently reintroduce an unreachable bar.
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import _tpu_probe
    assert 10 <= _tpu_probe.DEFAULT_BAR_TFLOPS <= 60
    assert bench._HEALTHY_TFLOPS == _tpu_probe.DEFAULT_BAR_TFLOPS
    queue = open(os.path.join(REPO, "tools", "tpu_recovery_queue.sh")).read()
    # the queue must call the probe with NO explicit bar so the probe's
    # DEFAULT_BAR_TFLOPS stays the single source of truth (ADVICE r3)
    assert re.search(r"_tpu_probe\.py\s*$", queue, re.M), \
        "queue must invoke the probe bare (no duplicated bar literal)"
    assert not re.search(r"_tpu_probe\.py\s+\d", queue)
