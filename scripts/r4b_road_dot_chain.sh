#!/bin/bash
# Round-4 follow-up chain (run AFTER r4_throughput_chain.sh; exclusive chip):
#  1. road-obs decomposition + MXU one-hot gather shootout (probe_road_dot)
#  2. end-to-end train SPS with road_gather=dot at the W=256 peak config
#     (baseline: 134,575 SPS with the row gather)
#  3. rollout/update split at the peak config (--update-epochs 0)
#  4. dispatch amortization: --iters-per-dispatch 4
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r4bchain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r4bchain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)" | tee -a "$LOG/r4bchain.log"
  fi
}

run road_dot_probe 7200 python scripts/probe_road_dot.py

run train_w256_dot 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 \
    --compact 4096 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 --road-gather dot \
    --train-iters 4 --repeats 2

run train_w256_rollout_only 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --update-epochs 0 \
    --compact 4096 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

run train_w256_k4 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --iters-per-dispatch 4 \
    --compact 4096 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 2 --repeats 2

echo "R4BCHAIN_DONE $(date)" | tee -a "$LOG/r4bchain.log"
