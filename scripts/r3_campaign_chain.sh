#!/bin/bash
# Round-3 campaign chain: re-measure train SPS at the campaign config with
# the fixed obs path (this also warms the campaign's exact program in the
# XLA cache), then pour everything into the 50M-step PPO campaign.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
TARGET=${2:-50000000}
mkdir -p "$LOG"

echo "=== train_w64_postfix start $(date +%H:%M:%S) ===" | tee -a "$LOG/r3chain.log"
timeout 1800 python bench.py --train --worlds 64 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --compact 64 --obs-store bf16 \
    --rollout-mode unroll --packed-io --train-iters 4 --repeats 2 \
    >"$LOG/train_w64_postfix.log" 2>&1
rc=$?
echo "--- train_w64_postfix rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r3chain.log"

echo "=== campaign start $(date +%H:%M:%S) ===" | tee -a "$LOG/r3chain.log"
PACKED_IO=1 bash scripts/ppo_campaign.sh "$TARGET" runs/campaign \
    >"$LOG/campaign_r3.log" 2>&1
echo "--- campaign rc=$? $(date +%H:%M:%S)" | tee -a "$LOG/r3chain.log"
echo "R3CAMPAIGN_DONE $(date)" | tee -a "$LOG/r3chain.log"
