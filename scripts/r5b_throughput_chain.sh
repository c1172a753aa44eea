#!/bin/bash
# Round-5 chain B: fused-embed train throughput, sensor benches, IL + RNN
# campaigns (VERDICT r4 items 1, 4, 5, 6).
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

# 1. Sensor benches first (VERDICT item 4) — small programs, quick compiles,
#    so the numbers land even if the big fused compile below runs long.
#    Lidar: the SURVEY hot spot, default and forced-10240 road buckets.  BEV
#    rasterizer and RGBD camera at sizes their [W, A, cells/rays, entities]
#    lattices allow.
run bench_lidar_w64 3600 python bench.py --worlds 64 --steps 91 --repeats 3 --lidar
run bench_lidar_r10240 3600 python bench.py --worlds 64 --steps 91 --repeats 3 \
    --lidar --max-roads 10240
run bench_bev_w8 3600 python bench.py --worlds 8 --steps 91 --repeats 3 --bev
run bench_camera_w4 3600 python bench.py --worlds 4 --steps 30 --repeats 3 \
    --camera --camera-size 64

# 2. The 200K attempt: round-4 peak config + split store + fused embed+pool.
run train_w256_fused 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 \
    --compact 4096 --compact-mode flat --obs-store split-bf16 \
    --policy-dtype bf16 --road-gather dot --fused-embed \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

# 2b. SB3-stack training SPS (VERDICT item 9): the reference's 25-50K row.
run bench_sb3_w32 3600 python scripts/bench_sb3.py --worlds 32 --windows 2

# 3. IL campaign on the v3 pool (VERDICT item 5): 256 train scenes over 8
#    batches, heldout eval on the next never-trained batch.
run il_pool_v3 10800 python -m gpudrive_lab_tpu.il.train \
    --data-dir data/pool_v3 --num-worlds 32 --num-batches 8 --epochs 16 \
    --batch-size 4096 --lr 1e-3 --agent-bucket 32 --eval-heldout \
    --out runs/bc_pool_v3.pkl

# 4. RNN learning campaign (VERDICT item 6): 50M steps at the round-4 67K
#    fast-path config on the 4 real WOMD scenes (the feed-forward round-3
#    campaign's setup, so the curves compare).
run rnn_campaign_50m 10800 python scripts/train_rnn.py --num-worlds 64 \
    --compact 1024 --policy-dtype bf16 --obs-store bf16 --unroll \
    --agent-bucket 64 --total-timesteps 50000000 \
    --checkpoint-path runs/rnn_campaign --continue-training

# 5. Rollout-floor attack (VERDICT item 7): single fused W=256 program vs
#    two interleaved independent W=128 shard programs, rollout-only.
run rollout_overlap 7200 python scripts/probe_rollout_overlap.py \
    --worlds 256 --compact 4096 --iters 6 --repeats 3

echo "R5BCHAIN_DONE $(date)" | tee -a "$LOG/r5chain.log"
