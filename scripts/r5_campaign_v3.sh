#!/bin/bash
# Round-5 chain A: resampling campaign on the v3 interaction pool
# (intersections / merges / crosswalk pedestrians), VERDICT r4 item 3.
#
# Trains on the 512 SYNTHETIC v3 scenes only — the 4 real WOMD examples are
# held out entirely, so the real-scene eval below is honest zero-shot
# (round 4's "zero-shot" number came from a campaign whose data dir included
# the real scenes at 4/516 sampling weight).
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

# Pool v3 is vehicles-max-26/scene: agent bucket 32 covers every batch;
# roads max 13/scene -> the minimum 256 bucket.  Pedestrian/cyclist scenes
# need KEEP_NON_VEHICLES (they are mark_as_expert, never controlled).
run resample_campaign_v3 7200 env \
    DATA_DIR=data/pool_v3 NUM_WORLDS=64 COMPACT=2048 COMPACT_MODE=flat \
    POLICY_DTYPE=bf16 PACKED_IO=1 AGENT_BUCKET=32 MAX_ROADS=256 \
    ROAD_GATHER=dot RESAMPLE_INTERVAL=1000000 CHUNK_TIMEOUT=6600 \
    KEEP_NON_VEHICLES=1 \
    bash scripts/ppo_campaign.sh 50000000 runs/campaign_v3

run campaign3_eval_pool 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_v3/policy.pkl \
    --scenes-dir data/pool_v3 --num-worlds 64 --episodes 2 \
    --keep-non-vehicles
run campaign3_eval_real_zeroshot 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_v3/policy.pkl \
    --scenes-dir /root/reference/data/processed/examples \
    --num-worlds 8 --episodes 2 --keep-non-vehicles

echo "R5CHAIN_DONE $(date)" | tee -a "$LOG/r5chain.log"
