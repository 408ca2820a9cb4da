#!/bin/bash
# Second r4 queue: rows invented mid-round (run AFTER run_r4.sh drains).
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results_r4
mkdir -p "$R"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES=none
i=100
run() {
  local name=$1 tmo=$2; shift 2
  i=$((i+1))
  local att rc
  for att in 1 2 3 4; do
    echo "[$(date +%H:%M:%S)] [$i] $name (attempt $att): $*"
    timeout "$tmo" "$@" > "$R/$name.txt" 2> "$R/$name.err"
    rc=$?
    echo "exit=$rc attempt=$att" >> "$R/$name.txt"
    echo "[$(date +%H:%M:%S)] [$i] $name attempt $att exit=$rc"
    [ "$rc" -eq 0 ] && break
    sleep 90
  done
}

# segmented-gradient training at config-5 sequence length (1e7)
run scale_fisher_10m 3600 python benchmarks/million_grad.py 10000000 20 --seg-fisher --segment=1000000

# diag_pallas rerun (unpack bug fixed mid-queue; rerun if attempt 4 used stale code)
#un diag_pallas_32k 1800 python benchmarks/diag_pallas.py 32768

# nuts_vs_smc: attempt 1 at (4 chains, 200+120) exceeded 3600 s on this
# chip; same cross-check at a budget that fits (3 chains, 140+90, depth
# via smaller segment count unchanged)
run nuts_vs_smc_1e5 5400 python benchmarks/nuts_vs_smc.py 100000 --segment=10 --chains=3 --samples=140 --warmup=90

# remaining original rows
run million_smc_1m_mapinit 3600 python benchmarks/million_smc.py 1000000 --host --map-init
run scaling_weak           2400 python benchmarks/scaling.py --cpu --weak
