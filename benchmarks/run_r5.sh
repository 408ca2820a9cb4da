#!/bin/bash
# Round-5 benchmark queue — STRICTLY SERIAL (2 host cores; any concurrency
# starves the TPU tunnel / remote-compile RPCs, see CLAUDE.md).
# Each row is independently retryable; artifacts land in results_r5/.
# Usage: bash benchmarks/run_r5.sh [start_index]
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results_r5
mkdir -p "$R"
START=${1:-0}
i=0

# Persistent compile cache for ALL TPU rows (stalls are nondeterministic;
# successful compiles persist, so retry-by-restart converges program by
# program).  NEVER shared with CPU runs (/tmp/jax_cache_cpu).
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES=none

run() {
  local name=$1 tmo=$2 attempts=$3; shift 3
  i=$((i+1))
  if [ $((i-1)) -lt "$START" ]; then echo "[skip $i] $name"; return; fi
  local att rc
  for att in $(seq 1 "$attempts"); do
    echo "[$(date +%H:%M:%S)] [$i] $name (attempt $att): $*"
    timeout "$tmo" "$@" > "$R/$name.txt" 2> "$R/$name.err"
    rc=$?
    echo "exit=$rc attempt=$att" >> "$R/$name.txt"
    echo "[$(date +%H:%M:%S)] [$i] $name attempt $att exit=$rc"
    [ "$rc" -eq 0 ] && break
    # A killed-mid-compile client can wedge the remote service; cool down.
    sleep 90
  done
}

# --- 1. FLAGSHIP: 16-output GPAR chain at N=1e6 (r4 verdict item 1) -------
run chain_16out_1m 5400 3 python benchmarks/chain_scale.py 1000000 --outputs=16 --steps=10

# --- 2. land the dead 10M training row (item 2) ---------------------------
run scale_fisher_10m 3600 3 python benchmarks/million_grad.py 10000000 20 --seg-fisher --segment=1000000

# --- 3. M-scaling of the 1M DTC: M = 128, 256 (item 3) --------------------
run m128_whiten 2400 3 python benchmarks/million_dtc.py 1000000 --m=128 --only=whiten
run m128_train  3000 3 python benchmarks/million_dtc.py 1000000 --m=128 --only=train --steps=10 --bwd-chunk=8
run m256_whiten 2400 3 python benchmarks/million_dtc.py 1000000 --m=256 --only=whiten
run m256_train  3600 3 python benchmarks/million_dtc.py 1000000 --m=256 --only=train --steps=10 --bwd-chunk=8

# --- 4. compute-bound MFU evidence (item 4) -------------------------------
run mfu 2400 3 python benchmarks/mfu.py

# --- 5. joint posterior sampling at 1M / 2M (item 6) ----------------------
run ffbs_1m      2400 3 python benchmarks/long_series.py 1000000 --only=ffbs --samples=4
run segsample_2m 2400 3 python benchmarks/long_series.py 2000000 --only=segsample --segment=1000000 --samples=4

# --- 6. converge the 32-chain NUTS row (item 5) ---------------------------
run ess_32_long 3600 3 python benchmarks/ess.py --chains=32 --samples=1000 --warmup=300

# --- 7. NUTS-vs-SMC cross-validation on TPU (item 2, second artifact) -----
run nuts_vs_smc_1e5 7200 2 python benchmarks/nuts_vs_smc.py 100000 --segment=10 --chains=3 --samples=140 --warmup=90

echo "[$(date +%H:%M:%S)] run_r5 queue complete"
