#!/bin/bash
# Round-5 chain E: continue the 10K-pool campaign (+50M steps on top of the
# 30M checkpoint — at 30M the curve was still climbing at ~34% train goal;
# each of the 10,240 scenes had been visited ~once).
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

run campaign_10k_cont 5400 env \
    DATA_DIR=data/pool_10k NUM_WORLDS=64 COMPACT=2048 COMPACT_MODE=flat \
    POLICY_DTYPE=bf16 PACKED_IO=1 AGENT_BUCKET=32 MAX_ROADS=256 \
    ROAD_GATHER=dot RESAMPLE_INTERVAL=250000 CHUNK_TIMEOUT=5100 \
    KEEP_NON_VEHICLES=1 \
    bash scripts/ppo_campaign.sh 80000000 runs/campaign_10k

run campaign10k_eval_pool2 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_10k/policy.pkl \
    --scenes-dir data/pool_10k --num-worlds 64 --episodes 2 \
    --keep-non-vehicles
run campaign10k_eval_real_zeroshot2 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_10k/policy.pkl \
    --scenes-dir /root/reference/data/processed/examples \
    --num-worlds 8 --episodes 2 --keep-non-vehicles

echo "R5ECHAIN_DONE $(date)" | tee -a "$LOG/r5chain.log"
