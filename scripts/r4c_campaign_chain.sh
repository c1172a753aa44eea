#!/bin/bash
# Round-4 chain C (run AFTER r4b; exclusive chip):
#  1. resampling PPO campaign on the 516-scene mixed pool (512 synthetic +
#     4 real WOMD examples), resample every 1M steps -> ~50 swap_data_batch
#     cycles under load (VERDICT r3 item 5)
#  2. deterministic eval of the final checkpoint on BOTH held-out synthetic
#     scenes and the real examples
#  3. IL scaling run: BC on 256 pool scenes with held-out closed-loop eval
#     (VERDICT r3 item 8)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r4cchain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r4cchain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)" | tee -a "$LOG/r4cchain.log"
  fi
}

# pool regen is idempotent; the campaign dir mixes in the 4 real scenes
if [ ! -d data/pool ] || [ "$(ls data/pool | wc -l)" -lt 512 ]; then
  python scripts/make_scene_pool.py --out data/pool --num 512
fi
mkdir -p data/campaign
ln -sf /root/repo/data/pool/*.json data/campaign/
ln -sf /root/reference/data/processed/examples/*.json data/campaign/

run resample_campaign 7200 env \
    DATA_DIR=data/campaign NUM_WORLDS=64 COMPACT=2048 COMPACT_MODE=flat \
    POLICY_DTYPE=bf16 PACKED_IO=1 AGENT_BUCKET=64 MAX_ROADS=1280 \
    ROAD_GATHER=dot EPOCH_PRESHUFFLE=1 \
    RESAMPLE_INTERVAL=1000000 CHUNK_TIMEOUT=6600 \
    bash scripts/ppo_campaign.sh 50000000 runs/campaign_resample

run campaign_eval_pool 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_resample/policy.pkl \
    --scenes-dir data/pool --num-worlds 64 --episodes 2
run campaign_eval_real 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_resample/policy.pkl \
    --scenes-dir /root/reference/data/processed/examples \
    --num-worlds 8 --episodes 2

run il_pool_scaling 10800 python -m gpudrive_lab_tpu.il.train \
    --data-dir data/pool --num-worlds 32 --num-batches 8 --epochs 40 \
    --batch-size 512 --agent-bucket 32 --eval-heldout \
    --out runs/bc_pool.pkl

echo "R4CCHAIN_DONE $(date)" | tee -a "$LOG/r4cchain.log"
