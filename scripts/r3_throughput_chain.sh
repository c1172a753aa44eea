#!/bin/bash
# Round-3 throughput experiment chain (sequential — exclusive chip):
#  1. body/obs/step standalone costs at W=256 (calibrates rollout share)
#  2. W=256 with 4x fewer minibatch segments (isolates update cost)
#  3. scan rollout mode at W=64 (is lax.scan usable post-scatter-fix?)
#  4. the round-2 body bisect, for the record (scatter vs gather place-back)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r3chain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r3chain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)"
  fi
}

run w256_body 1200 python scripts/probe_w256_body.py
run train_w256_mb8 1800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 8 --compact 64 --obs-store bf16 \
    --rollout-mode unroll --packed-io --train-iters 4 --repeats 2
run train_w64_scan 1800 python bench.py --train --worlds 64 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --compact 64 --obs-store bf16 \
    --rollout-mode scan --packed-io --train-iters 4 --repeats 2
run body_bisect 1200 python scripts/probe_body_bisect.py
echo "R3CHAIN_DONE $(date)" | tee -a "$LOG/r3chain.log"
