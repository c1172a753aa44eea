#!/bin/bash
# TPU measurement runbook (round-2 close-out): run the moment the tunnel
# answers.  Sequential — the chip is exclusive-access; never overlap runs.
# Each step logs to bench_logs/ and tolerates failure (later steps still run).
#
# Trimmed to the pre-campaign essentials; diagnostics that don't gate the
# campaign live in tpu_post_campaign.sh so the 50M-step PPO campaign starts
# as early as possible.
#
# Usage: scripts/tpu_runbook.sh [logdir]

set -u
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() { # name timeout_s cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/runbook.log"
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name rc=$? ($(date +%H:%M:%S))" | tee -a "$LOG/runbook.log"
}

# 0. device sanity + warm the compile cache with the cheap sim bench
run sanity 120 python -c "import jax; print(jax.devices())"

# 1. sim headline (regression check after the packed-gather obs rewrite)
run sim_headline 3600 python bench.py --repeats 3

# 2. honest end-to-end train SPS at the campaign config, K=1 then K=4
#    (compile is slow — minutes to tens of minutes — but persists in the
#    XLA cache; the timing loop excludes it)
run train_w64_k1 10800 python bench.py --train --worlds 64 --rollout-len 32 --init-steps 11 \
    --num-minibatches 16 --compact 64 --obs-store bf16 \
    --rollout-mode unroll --train-iters 4 --repeats 2
run train_w64_k4 10800 python bench.py --train --worlds 64 --rollout-len 32 --init-steps 11 \
    --num-minibatches 16 --compact 64 --obs-store bf16 \
    --rollout-mode unroll --iters-per-dispatch 4 --train-iters 2 --repeats 2

# 3. packed-io point: ~12 handles per dispatch instead of ~227 — if the
#    tunnel's per-handle dispatch cost still dominates after K-folding,
#    this is the winning campaign config (PACKED_IO=1 ppo_campaign.sh)
run train_w64_packed 10800 python bench.py --train --worlds 64 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 --compact 64 --obs-store bf16 \
    --rollout-mode unroll --packed-io --train-iters 4 --repeats 2

echo "runbook complete ($(date)); launch scripts/ppo_campaign.sh next" \
  | tee -a "$LOG/runbook.log"
