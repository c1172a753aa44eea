#!/bin/bash
# Round-2 continuation chain: the TPU answered, so run the close-out
# measurements the previous session was blocked on, then pour every
# remaining second into the PPO campaign.  Sequential — exclusive chip.
#
# Usage: scripts/r2b_chain.sh <deadline_epoch> [logdir]
set -u
DEADLINE=$1
cd "$(dirname "$0")/.."
LOG=${2:-bench_logs}
mkdir -p "$LOG"

left() { echo $(( DEADLINE - $(date +%s) )); }

run() { # name max_s cmd...
  local name=$1 cap=$2; shift 2
  local budget=$(left)
  [ "$budget" -le 60 ] && { echo "SKIP $name (past deadline)" >>"$LOG/runbook.log"; return; }
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "=== $name start $(date +%H:%M:%S) budget=${budget}s ===" >>"$LOG/runbook.log"
  timeout "$budget" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" >>"$LOG/runbook.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)"
  fi
}

# 1. sim headline: regression check after the packed-gather obs rewrite
run sim_headline 900 python bench.py --repeats 3

# 2. honest end-to-end train SPS at the campaign config (packed-io dispatch)
run train_packed 1800 python bench.py --train --worlds 64 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --compact 64 --obs-store bf16 \
    --rollout-mode unroll --packed-io --train-iters 4 --repeats 2

# 3. campaign: resumable, so give it exactly the time that remains
budget=$(left)
if [ "$budget" -gt 120 ]; then
  echo "=== campaign start $(date +%H:%M:%S) budget=${budget}s ===" >>"$LOG/runbook.log"
  PACKED_IO=1 CHUNK_TIMEOUT=$budget timeout "$budget" \
    bash scripts/ppo_campaign.sh 50000000 runs/campaign >"$LOG/campaign.log" 2>&1
  echo "--- campaign rc=$? $(date +%H:%M:%S)" >>"$LOG/runbook.log"
fi
echo "CHAIN_DONE $(date)" >>"$LOG/runbook.log"
