#!/bin/bash
# Round-4 chain E: wait for the orphaned ep1 bench (pid $2) to release the
# chip, then measure epoch_preshuffle end-to-end at the W=256 peak config
# (A/B against the 137,116 SPS dot-gather point), then hand off to chain C
# (resampling campaign + IL scaling).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
WAIT_PID=${2:-0}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r4echain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r4echain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)" | tee -a "$LOG/r4echain.log"
  fi
}

if [ "$WAIT_PID" -gt 0 ]; then
  echo "waiting for pid $WAIT_PID (ep1 bench) to exit..." | tee -a "$LOG/r4echain.log"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  echo "pid $WAIT_PID gone at $(date +%H:%M:%S)" | tee -a "$LOG/r4echain.log"
fi

run train_w256_preshuffle 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --epoch-preshuffle \
    --compact 4096 --compact-mode flat --obs-store bf16 --policy-dtype bf16 \
    --rollout-mode unroll --packed-io --agent-bucket 64 --road-gather dot \
    --train-iters 4 --repeats 2

echo "R4ECHAIN_DONE $(date)" | tee -a "$LOG/r4echain.log"

exec bash scripts/r4c_campaign_chain.sh "$LOG"
