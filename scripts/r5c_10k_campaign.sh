#!/bin/bash
# Round-5 chain C: resampling campaign over a 10,240-scene v3 pool —
# training-scale realism (the reference's published policy trains on 10K
# WOMD scenes, reference: README.md:207-213).  Resample every 250K steps ->
# ~200 swaps x 64 worlds = 12,800 scene slots, covering the pool.
# Real WOMD examples held out entirely (zero-shot eval below).
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

# 0. Fused-embed train bench re-run (VERDICT item 1): the chain-B attempt
#    died in a Mosaic scoped-vmem OOM at TB=128; TB=32 AOT-verified.
run train_w256_fused2 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 \
    --compact 4096 --compact-mode flat --obs-store split-bf16 \
    --policy-dtype bf16 --road-gather dot --fused-embed \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

# 0b. Sensor benches with the memory-bounded paths (chain-B ran the dense
#     code: lidar R=10240 and BEV both OOM'd 16 GB HBM).
run bench_lidar_w64_v2 3600 python bench.py --worlds 64 --steps 91 --repeats 3 --lidar
run bench_lidar_r10240_v2 3600 python bench.py --worlds 64 --steps 91 --repeats 3 \
    --lidar --max-roads 10240
run bench_bev_w8_v2 3600 python bench.py --worlds 8 --steps 91 --repeats 3 --bev

# 0c. SB3 bench re-run: device-side controlled-row gather (the full-obs
#     tunnel fetch measured 110 SPS in chain B).
run bench_sb3_w32_v2 3600 python scripts/bench_sb3.py --worlds 32 --windows 2

# 0d. IL campaign re-run (VERDICT item 5): batch 4096 OOM'd HBM (the
#     attention logits [B, 4, 328, 328] are 6.6 GB each in the backward);
#     batch 512 bounds them at ~800 MB.
run il_pool_v3b 7200 python -m gpudrive_lab_tpu.il.train \
    --data-dir data/pool_v3 --num-worlds 32 --num-batches 8 --epochs 16 \
    --batch-size 512 --lr 1e-3 --agent-bucket 32 --eval-heldout \
    --out runs/bc_pool_v3.pkl

# 30M steps: the pool-v3 curve converges by ~20-25M, and the shorter budget
# keeps the whole chain inside the round (120 swaps x 64 worlds = 7,680
# scene slots of the 10,240 pool).
run campaign_10k 3600 env \
    DATA_DIR=data/pool_10k NUM_WORLDS=64 COMPACT=2048 COMPACT_MODE=flat \
    POLICY_DTYPE=bf16 PACKED_IO=1 AGENT_BUCKET=32 MAX_ROADS=256 \
    ROAD_GATHER=dot RESAMPLE_INTERVAL=250000 CHUNK_TIMEOUT=3400 \
    KEEP_NON_VEHICLES=1 \
    bash scripts/ppo_campaign.sh 30000000 runs/campaign_10k

run campaign10k_eval_pool 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_10k/policy.pkl \
    --scenes-dir data/pool_10k --num-worlds 64 --episodes 2 \
    --keep-non-vehicles
run campaign10k_eval_real_zeroshot 3600 python scripts/eval_checkpoint.py \
    --checkpoint runs/campaign_10k/policy.pkl \
    --scenes-dir /root/reference/data/processed/examples \
    --num-worlds 8 --episodes 2 --keep-non-vehicles

echo "R5CCHAIN_DONE $(date)" | tee -a "$LOG/r5chain.log"
