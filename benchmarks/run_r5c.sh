#!/bin/bash
# Round-5 final queue: reruns of every row whose fix landed after its last
# attempt (run_r5b was killed at the 11:07 round boundary before reaching
# them).  Priority order: quick fixed rows first, flagship chain early,
# riskiest/longest last.  STRICTLY SERIAL; same conventions as run_r5.sh.
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results_r5
mkdir -p "$R"
START=${1:-0}
i=200
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu
export JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES=none

run() {
  local name=$1 tmo=$2 attempts=$3; shift 3
  i=$((i+1))
  if [ $((i-201)) -lt "$START" ]; then echo "[skip $i] $name"; return; fi
  local att rc
  for att in $(seq 1 "$attempts"); do
    echo "[$(date +%H:%M:%S)] [$i] $name (attempt $att): $*"
    timeout "$tmo" "$@" > "$R/$name.txt" 2> "$R/$name.err"
    rc=$?
    echo "exit=$rc attempt=$att" >> "$R/$name.txt"
    echo "[$(date +%H:%M:%S)] [$i] $name attempt $att exit=$rc"
    [ "$rc" -eq 0 ] && break
    sleep 90
  done
}

# 1. fixed MFU (full-output consumption) — quick
run mfu 1800 2 python benchmarks/mfu.py

# 2. flagship chain rerun (host-f64 M x M algebra past the f32 cliff;
#    CPU-verified at N=4k: rmse ~0.019, coverage 1.0)
run chain_16out_1m 5400 2 python benchmarks/chain_scale.py 1000000 --outputs=16 --steps=10

# 3. M-scaling train via the mixed-column backward; M=256 also fwd-chunked
run m128_train 3000 2 python benchmarks/million_dtc.py 1000000 --m=128 --only=train --steps=10 --mixed-bwd=8
run m256_whiten 2400 2 python benchmarks/million_dtc.py 1000000 --m=256 --only=whiten --fwd-chunk=64
run m256_train 3600 2 python benchmarks/million_dtc.py 1000000 --m=256 --only=train --steps=10 --mixed-bwd=8 --fwd-chunk=64

# 4. blocked FFBS at 1M (E + g now travel flat between dispatches)
run ffbs_1m 2400 2 python benchmarks/long_series.py 1000000 --only=ffbs --samples=4

# 5. 32-chain mixing: 1000 kept gave split-R-hat 1.0113; 1800 should land it
run ess_32_1800 3600 2 python benchmarks/ess.py --chains=32 --samples=1800 --warmup=300

# 6. 10M training retry at a different segment size (fresh compile-stall rolls)
run scale_fisher_10m 3600 2 python benchmarks/million_grad.py 10000000 20 --seg-fisher --segment=500000

# 7. NUTS-vs-SMC last (longest, riskiest)
run nuts_vs_smc_1e5 7200 1 python benchmarks/nuts_vs_smc.py 100000 --segment=10 --chains=3 --samples=140 --warmup=90

echo "[$(date +%H:%M:%S)] run_r5c queue complete"
