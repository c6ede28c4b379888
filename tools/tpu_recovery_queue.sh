#!/bin/bash
# TPU-recovery measurement queue (VERDICT r2 #1): wait until the axon tunnel
# is genuinely healthy (>80 TFLOP/s on a matmul chain), then run every queued
# measurement in sequence, logging to $OUT. Designed to be (re)armed from any
# session: `nohup bash tools/tpu_recovery_queue.sh & echo $! > /tmp/queue.pid`
#
# The axon tunnel spends long windows degraded (~2 TFLOP/s) or fully wedged
# (probe subprocess hangs — hence the per-probe timeout); it recovers by
# itself. Bench results from a degraded window are mirages (CLAUDE.md), so
# nothing here runs until a probe clears the bar — and because the tunnel can
# degrade again MID-QUEUE, health is re-probed before every job and any job
# that started in a window that later went bad is marked SUSPECT and re-run
# when health returns.
#
# Results live in the repo (zlog/tpu_queue/), not /tmp: the VM restarts
# between sessions and /tmp is wiped (it ate one degraded-window run already).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-zlog/tpu_queue_r4}
mkdir -p "$OUT"

# SINGLE-INSTANCE LOCK. This morning two armed queue instances ran
# concurrently: the waiting one's wait_healthy probes (150-matmul chains)
# stole the chip from the running one's jobs every 120 s, poisoning slices of
# every measurement (zlog/tpu_queue/status shows "degraded" probe readings
# DURING healthy-window jobs — that was contention, not the tunnel).
exec 9> "$OUT/.lock"
if ! flock -n 9; then
  echo "another queue instance holds $OUT/.lock — exiting" >&2
  exit 1
fi

# Canonical probe (tools/_tpu_probe.py): scalar-readback timing, bar 45
# TFLOP/s. The old inline probe timed a 32 MB device->host fetch, so its
# reading was tunnel-bandwidth-bound and its >80 bar may have been
# unreachable even on a healthy chip (it was never observed passing).
probe() {
  # no explicit bar: the probe applies its own DEFAULT_BAR_TFLOPS, the
  # single source of truth (ADVICE r3: don't duplicate the literal).
  timeout 300 python tools/_tpu_probe.py
}

wait_healthy() { # blocks until a probe clears the bar; echoes the TFLOP/s
  local tf
  while true; do
    tf=$(probe) && { echo "$tf"; return 0; }
    echo "$(date -u +%H:%M:%S) degraded ${tf:-0} TFLOP/s" >> "$OUT/status"
    sleep 120
  done
}

echo "$(date -u +%F' '%H:%M:%S) queue armed (pid $$)" >> "$OUT/status"
TF=$(wait_healthy)
echo "$(date -u +%F' '%H:%M:%S) HEALTHY ${TF} TFLOP/s — running queue" >> "$OUT/status"

run() { # run <name> <timeout_s> <cmd...> — health-gated, post-checked
  local name=$1 to=$2; shift 2
  [ -e "$OUT/$name.ok" ] && return 0  # done in an earlier pass/session
  # pre-probe: the window may have closed while the previous job ran
  local tf
  if ! tf=$(probe); then
    echo "$(date -u +%H:%M:%S) window closed (${tf:-0} TFLOP/s) before $name — rewaiting" >> "$OUT/status"
    tf=$(wait_healthy)
    echo "$(date -u +%H:%M:%S) window reopened ${tf} TFLOP/s" >> "$OUT/status"
  fi
  echo "$(date -u +%H:%M:%S) START $name (probe ${tf} TFLOP/s)" >> "$OUT/status"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  # post-probe: if the chip is degraded NOW, the numbers above are suspect
  if tf=$(probe); then
    echo "$(date -u +%H:%M:%S) DONE $name rc=$rc (post-probe ${tf} TFLOP/s)" >> "$OUT/status"
    [ $rc -eq 0 ] && touch "$OUT/$name.ok"
  else
    mv "$OUT/$name.log" "$OUT/$name.suspect.log" 2>/dev/null
    echo "$(date -u +%H:%M:%S) SUSPECT $name rc=$rc (degraded ${tf:-0} TFLOP/s after) — will re-run" >> "$OUT/status"
  fi
}

# flagship first: short healthy windows must lock in the headline number
# before the exploratory measurements get a chance to eat the window.
# Two passes: anything marked SUSPECT in pass 1 gets one retry.
# Round-4 queue (VERDICT r3): MFU accounting, chain-kernel localization,
# fixed 256² profiler (r3 died on HTTP 413), overhead-fixed time-to-quality,
# stage-2 ttq jax sides, then the full suite (incl. the new `auto` row).
for pass in 1 2; do
  run bench            900  python bench.py
  run mfu              1800 python tools/mfu.py
  run localize_chain   1800 python tools/localize_chain_error.py
  run profile_vqgan256 1500 python tools/profile_vqgan_256.py
  run ttq_vqvae        1200 python tools/time_to_quality.py
  run ttq_gpt          1500 python tools/time_to_quality.py --family gpt
  run ttq_g3d          1500 python tools/time_to_quality.py --family gaussian3d
  run bench_suite      3600 python bench_suite.py
done
touch "$OUT/DONE"
echo "$(date -u +%F' '%H:%M:%S) queue complete" >> "$OUT/status"
