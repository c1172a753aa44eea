#!/bin/bash
# Round-4 chain F: resampling campaign on the v2 pool (goal-distance
# diversity) after v1 collapsed to drive-safe-reach-nothing.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_logs}
mkdir -p "$LOG"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" | tee -a "$LOG/r4fchain.log"
  timeout "$cap" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc $(date +%H:%M:%S)" | tee -a "$LOG/r4fchain.log"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    echo "WARN: $name failed rc=$rc (see $LOG/$name.log)" | tee -a "$LOG/r4fchain.log"
  fi
}

run resample_campaign_v2 7200 env \
    DATA_DIR=data/campaign NUM_WORLDS=64 COMPACT=2048 COMPACT_MODE=flat \
    POLICY_DTYPE=bf16 PACKED_IO=1 AGENT_BUCKET=64 MAX_ROADS=1280 \
    ROAD_GATHER=dot RESAMPLE_INTERVAL=1000000 CHUNK_TIMEOUT=6600 \
    bash scripts/ppo_campaign.sh 50000000 runs/campaign_resample2

run campaign2_eval_pool 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_resample2/policy.pkl \
    --scenes-dir data/pool --num-worlds 64 --episodes 2
run campaign2_eval_real 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_resample2/policy.pkl \
    --scenes-dir /root/reference/data/processed/examples \
    --num-worlds 8 --episodes 2

# IL scaling on the v2 pool.  Dispatch-aware sizing: each train batch is
# one remote dispatch (~0.5-1 s on the tunnel), so 4096-sample batches
# (~92 dispatches/epoch over ~380K samples) keep 8 epochs inside ~15 min
# where the original 512-batch 40-epoch config would have run for hours.
run il_pool_scaling 7200 python -m gpudrive_lab_tpu.il.train \
    --data-dir data/pool --num-worlds 32 --num-batches 8 --epochs 8 \
    --batch-size 4096 --lr 1e-3 --agent-bucket 32 --eval-heldout \
    --out runs/bc_pool.pkl

echo "R4FCHAIN_DONE $(date)" | tee -a "$LOG/r4fchain.log"
