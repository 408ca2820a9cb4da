#!/bin/bash
# Round-4 benchmark queue — STRICTLY SERIAL (2 host cores; any concurrency
# starves the TPU tunnel / remote-compile RPCs, see CLAUDE.md).
# Each row is independently retryable; artifacts land in results_r4/.
# Usage: bash benchmarks/run_r4.sh [start_index]
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results_r4
mkdir -p "$R"
START=${1:-0}
i=0

# Persistent compile cache for ALL TPU rows: the remote compile service
# stalls NONDETERMINISTICALLY (diag_dtc_1m: the same program compiles in
# 21 s on one attempt and stalls >420 s on another; even a 64x64 warmup jit
# can hang).  Successful compiles persist here, so retry-by-restart
# converges program by program.  CPU rows force-override to
# /tmp/jax_cache_cpu in setup_jax (never share the two).
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES=none

run() {
  local name=$1 tmo=$2; shift 2
  i=$((i+1))
  if [ $((i-1)) -lt "$START" ]; then echo "[skip $i] $name"; return; fi
  local att rc
  for att in 1 2 3 4; do
    echo "[$(date +%H:%M:%S)] [$i] $name (attempt $att): $*"
    timeout "$tmo" "$@" > "$R/$name.txt" 2> "$R/$name.err"
    rc=$?
    echo "exit=$rc attempt=$att" >> "$R/$name.txt"
    echo "[$(date +%H:%M:%S)] [$i] $name attempt $att exit=$rc"
    [ "$rc" -eq 0 ] && break
    # A killed-mid-compile client can leave the remote service wedged for a
    # while (r3: "a client started while the worker restarts hangs
    # indefinitely"); cool down before retrying.
    sleep 90
  done
}

# --- flagship: scaled-GPAR DTC at 1M (VERDICT r3 item 1) -----------------
run million_dtc_1m_whiten  2400 python benchmarks/million_dtc.py 1000000 --only=whiten
run million_dtc_1m_train   1500 python benchmarks/million_dtc.py 1000000 --only=train --steps=20
run million_dtc_1m_predict 1500 python benchmarks/million_dtc.py 1000000 --only=predict --chunk-cols=8

# --- clean exit=0 flagship filter row (item 5) ---------------------------
run long_series_1m_filter  1200 python benchmarks/long_series.py 1000000 --only=filter

# --- scale past 1M toward config 5 (item 3) ------------------------------
run scale_filter_2m        1500 python benchmarks/long_series.py 2000000 --only=segfilter --segment=1000000
run scale_filter_4m        1500 python benchmarks/long_series.py 4000000 --only=segfilter --segment=1000000
run scale_filter_10m       2400 python benchmarks/long_series.py 10000000 --only=segfilter --segment=1000000
run scale_smooth_10m       2400 python benchmarks/long_series.py 10000000 --only=segsmooth --segment=500000
# scale_fisher_10m: single-dispatch fwd plan ~14.4 GB/M steps OOMs beyond ~1.1e6;
# segmented-gradient variant measured separately (see scale_fisher rows below)

# --- ESS story (item 4) ---------------------------------------------------
run ess_full               2400 python benchmarks/ess.py --full
run ess_32                 2400 python benchmarks/ess.py --chains=32

# --- diagnosis artifact (item 5) ------------------------------------------
run diag_pallas_32k        1800 python benchmarks/diag_pallas.py 32768

# --- fisher trace at 1M (item 5) ------------------------------------------
run million_grad_1m_fisher150 3000 python benchmarks/million_grad.py 1000000 150 --fisher

# --- NUTS vs SMC cross-validation (item 7) --------------------------------
run nuts_vs_smc_1e5        3600 python benchmarks/nuts_vs_smc.py 100000 --segment=10

# --- map-init SMC bridge at 1M (item 8) -----------------------------------
run million_smc_1m_mapinit 3600 python benchmarks/million_smc.py 1000000 --host --map-init

# --- clean-cache CPU weak scaling rerun (advisor item 1) ------------------
# setup_jax(cpu=True) now force-overrides the cache dir to /tmp/jax_cache_cpu;
# wipe it first so no remote-compiled AOT executable (built for the compile
# service's host CPU) can be loaded locally.
rm -rf /tmp/jax_cache_cpu
run scaling_weak           2400 python benchmarks/scaling.py --cpu --weak

echo "[$(date +%H:%M:%S)] run_r4 queue complete"
