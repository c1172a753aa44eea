#!/bin/bash
# Round-4 chain D (run AFTER r4b): decompose the update phase, then hand
# off to chain C (resampling campaign + IL scaling).
#
# Known at this point (bench_logs): full iter 0.830 s (dot gather),
# rollout-only 0.335 s -> update4 = 0.495 s while the pure minibatch math
# benches at ~1-2 ms x 64.  These two runs split the residual:
#   epochs1: update1 = iter - 0.335 -> per-epoch scaling
#   mb4:     4 fat minibatches instead of 16 -> per-minibatch fixed cost
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r4dchain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r4dchain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)" | tee -a "$LOG/r4dchain.log"
  fi
}

run train_w256_dot_ep1 7200 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --update-epochs 1 \
    --compact 4096 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 --road-gather dot \
    --train-iters 4 --repeats 2

run train_w256_dot_mb4 7200 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 4 \
    --compact 4096 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 --road-gather dot \
    --train-iters 4 --repeats 2

echo "R4DCHAIN_DONE $(date)" | tee -a "$LOG/r4dchain.log"

exec bash scripts/r4c_campaign_chain.sh "$LOG"
