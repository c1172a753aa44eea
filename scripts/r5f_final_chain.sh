#!/bin/bash
# Round-5 chain F (final): land the three queued-but-unrecorded results.
#  1. Split-store train bench WITHOUT the fused kernel (control — the
#     round-4 peak config compiled and measured 137K; this isolates what
#     the split store alone buys).
#  2. The 200K attempt: split-bf16 store + Pallas fused embed+pool.
#  3. Floored RNN campaign (the un-floored 50M run collapsed; the
#     entropy-floor controller landed in 59abc8c but was never re-run).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r5chain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r5chain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)" | tee -a "$LOG/r5chain.log"
  fi
}

run train_w256_split 1500 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 \
    --compact 4096 --compact-mode flat --obs-store split-bf16 \
    --policy-dtype bf16 --road-gather dot \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

run train_w256_fused 1800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 \
    --compact 4096 --compact-mode flat --obs-store split-bf16 \
    --policy-dtype bf16 --road-gather dot --fused-embed \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

run rnn_campaign_floor 2400 python scripts/train_rnn.py --num-worlds 64 \
    --compact 1024 --policy-dtype bf16 --obs-store bf16 --unroll \
    --agent-bucket 64 --total-timesteps 50000000 --entropy-floor 2.0 \
    --checkpoint-path runs/rnn_campaign2

echo "R5FCHAIN_DONE $(date)" | tee -a "$LOG/r5chain.log"
