#!/bin/bash
# Round-4 throughput chain (sequential — exclusive chip):
#  1. device sanity + sim headline regression (obs fast-path landed since r3)
#  2. W=512 / W=1024 flat+bucket train SPS with row-axis minibatch slicing
#     (the r3 W>=512 unlock; VERDICT r3 item 1: target >=250K controlled SPS)
#  3. W=256 round-3 peak config regression (134,575 SPS reference point)
#  4. RNN learner fast path (flat+bf16+unroll; VERDICT r3 item 6: >=10K SPS)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r4chain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r4chain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)" | tee -a "$LOG/r4chain.log"
  fi
}

run sanity 900 python -c "import jax; print(jax.devices())"

run sim_headline 3600 python bench.py --repeats 3

# W=512: N=8192 flat rows, minibatch [4, 2048] = 8192 samples (parity with
# the reference's minibatch), 32 total minibatches x 4 epochs.
run train_w512_rows 10800 python bench.py --train --worlds 512 --init-steps 11 \
    --rollout-len 32 --num-minibatches 32 --minibatch-rows 2048 \
    --compact 8192 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

# W=1024: N=16384, minibatch [4, 2048], 64 total minibatches.
run train_w1024_rows 10800 python bench.py --train --worlds 1024 --init-steps 11 \
    --rollout-len 32 --num-minibatches 64 --minibatch-rows 2048 \
    --compact 16384 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 2 --repeats 2

# Round-3 peak config, for regression (was 134,575 controlled SPS).
run train_w256_flat 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 \
    --compact 4096 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

# RNN fast path: flat compaction + bf16 + unroll (r3 baseline: 1.2K SPS).
run rnn_fast 7200 python scripts/train_rnn.py --num-worlds 64 --compact 1024 \
    --policy-dtype bf16 --obs-store bf16 --unroll --agent-bucket 64 \
    --total-timesteps 2000000 --checkpoint-path runs/rnn_r4

echo "R4CHAIN_DONE $(date)" | tee -a "$LOG/r4chain.log"
