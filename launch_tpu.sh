#!/usr/bin/env bash
# TPU launch script — the reference's slurm_train.slurm equivalent
# (single-host fire-and-forget; SURVEY §2.1). For multi-host TPU pods, run the
# same command on every worker (e.g. via `gcloud compute tpus tpu-vm ssh
# --worker=all`); jax.distributed.initialize() is called automatically by JAX
# on TPU pods and the Mesh spans all hosts.
set -euo pipefail

CONFIG="${1:-configs/training_config_small.yml}"
shift || true

# build the native data loader if a toolchain is present
if command -v g++ >/dev/null && [ ! -f native/libsampledb.so ]; then
  make -C native || echo "native loader build failed; python path will be used"
fi

# persistent XLA compile cache (also enabled in-process by the entry points)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

exec python train.py --config "$CONFIG" "$@"
