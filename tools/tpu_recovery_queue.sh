#!/bin/bash
# TPU-recovery measurement queue (VERDICT r2 #1): wait until the axon tunnel
# is genuinely healthy (>80 TFLOP/s on a matmul chain), then run every queued
# measurement in sequence, logging to $OUT. Designed to be (re)armed from any
# session: `nohup bash tools/tpu_recovery_queue.sh & echo $! > /tmp/queue.pid`
#
# The axon tunnel spends long windows degraded (~2 TFLOP/s) or fully wedged
# (probe subprocess hangs — hence the per-probe timeout); it recovers by
# itself. Bench results from a degraded window are mirages (CLAUDE.md), so
# nothing here runs until a probe clears the bar.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_queue_out}
mkdir -p "$OUT"

probe() {
  timeout 300 python - <<'EOF'
import time, sys
import jax, jax.numpy as jnp, numpy as np
a = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)
g = jax.jit(lambda a: jax.lax.scan(lambda c, _: (jnp.tanh(c @ a), None),
                                   a, None, length=20)[0])
float(np.asarray(g(a)).sum())
t0 = time.perf_counter(); float(np.asarray(g(a)).sum())
tf = 137e9 * 20 / (time.perf_counter() - t0) / 1e12
print(f"{tf:.1f}")
sys.exit(0 if tf > 80 else 1)
EOF
}

echo "$(date -u +%F' '%H:%M:%S) queue armed" >> "$OUT/status"
while true; do
  TF=$(probe) && break
  echo "$(date -u +%H:%M:%S) degraded ${TF:-0} TFLOP/s" >> "$OUT/status"
  sleep 120
done
echo "$(date -u +%F' '%H:%M:%S) HEALTHY ${TF} TFLOP/s — running queue" >> "$OUT/status"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "$(date -u +%H:%M:%S) START $name" >> "$OUT/status"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "$(date -u +%H:%M:%S) DONE $name rc=$?" >> "$OUT/status"
}

# flagship first: short healthy windows must lock in the headline number
# before the exploratory measurements get a chance to eat the window
run bench            900  python bench.py
run bench_bottleneck 1800 python tools/bench_bottleneck.py
run profile_vqgan256 1500 python tools/profile_vqgan_256.py
run bench_int8       1200 python tools/bench_int8.py
run check_prng       900  python tools/check_prng_kernel.py
run profile_discrete 1800 python tools/profile_discrete.py
run time_to_quality  1200 python tools/time_to_quality.py
run bench_suite      3600 python bench_suite.py
touch "$OUT/DONE"
echo "$(date -u +%F' '%H:%M:%S) queue complete" >> "$OUT/status"
