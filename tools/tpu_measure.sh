#!/bin/bash
# Serialized TPU measurement pass (never run two TPU pythons at once).
# Usage: bash tools/tpu_measure.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_meas}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  PYTHONUNBUFFERED=1 timeout "$tmo" "$@" 2>&1 | grep -v WARNING \
    | tee "$OUT/$name.txt" | tail -4
  local rc=${PIPESTATUS[0]}           # the measured command's status,
  echo "--- rc=$rc ---"               # not tail's
}

# health gate
if ! timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print(float(np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(64.)))))
" >/dev/null 2>&1; then
  echo "TPU tunnel unhealthy; aborting"; exit 1
fi
echo "tunnel healthy"

run profile_viterbi 900 python tools/profile_chain.py 64 18 --viterbi
run profile_deconv  600 python tools/profile_chain.py 64 18
run bench_e2e_vit   900 python tools/bench_e2e.py 64 18 20 --viterbi
run bench_e2e       600 python tools/bench_e2e.py 64 18 20
run bench_headline  900 python bench.py
echo "ALL DONE"
