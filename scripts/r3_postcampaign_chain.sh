#!/bin/bash
# Round-3 post-campaign chain: the >=100K-SPS push (bf16 policy compute +
# world scaling with obs remat), the LSTM learning-curve run, then the
# refreshed headline numbers.
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

# 1. bf16 policy at the W=64 campaign shape (isolates the bf16 win)
run train_w64_bf16 1800 python bench.py --train --worlds 64 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --compact 64 --obs-store bf16 \
    --policy-dtype bf16 --rollout-mode unroll --packed-io \
    --train-iters 4 --repeats 2
# 2. W=512 with obs remat + bf16 (the projected ~100-200K config)
run train_w512_bf16 2400 python bench.py --train --worlds 512 --init-steps 11 \
    --rollout-len 32 --num-minibatches 32 --compact 64 --obs-store remat \
    --policy-dtype bf16 --rollout-mode unroll --packed-io \
    --train-iters 4 --repeats 2
# 3. W=256 bf16 with stored bf16 obs (middle point)
run train_w256_bf16 2400 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 32 --compact 64 --obs-store bf16 \
    --policy-dtype bf16 --rollout-mode unroll --packed-io \
    --train-iters 4 --repeats 2
# 4. LSTM learning-curve run (scan-based; ~200K steps)
run train_rnn 2400 python scripts/train_rnn.py --num-worlds 16 \
    --total-timesteps 200000 --rollout-len 32 --num-minibatches 4 \
    --update-epochs 2 --checkpoint-path runs/rnn
# 5. refreshed sim headline (default bench) for the record
run sim_headline_r3 900 python bench.py --repeats 3
echo "R3POST_DONE $(date)" | tee -a "$LOG/r3chain.log"
