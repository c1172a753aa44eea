#!/bin/bash
# Post-campaign TPU diagnostics: the measurements that inform docs but do
# not gate the 50M-step PPO campaign.  Run after the campaign finishes.
#
# Usage: scripts/tpu_post_campaign.sh [logdir]

set -u
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() { # name timeout_s cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/runbook.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name rc=$? ($(date +%H:%M:%S))" | tee -a "$LOG/runbook.log"
}

# obs anatomy probe: did the packed-gather rewrite kill the 435 ms body?
run obs_anatomy 5400 python scripts/probe_obs_anatomy.py

# larger-batch train point (amortizes dispatch differently than K-folding)
run train_w256_k1 10800 python bench.py --train --worlds 256 --rollout-len 32 --init-steps 11 \
    --num-minibatches 16 --compact 64 --obs-store bf16 \
    --rollout-mode unroll --train-iters 2 --repeats 2

echo "post-campaign diagnostics complete ($(date))" | tee -a "$LOG/runbook.log"
