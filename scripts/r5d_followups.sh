#!/bin/bash
# Round-5 chain D: follow-ups after chain C — RNN campaign re-run with the
# entropy-floor controller (the un-floored 50M BPTT run collapsed to
# zero-entropy do-nothing; runs/rnn_campaign).
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

# Fused-embed train bench, third attempt: chain-C's died on a Mosaic bf16
# layout cast inside the kernel (fixed: whole-block f32 cast before chunk
# slicing; bf16 fwd+bwd AOT-verified at both production shapes).
run train_w256_fused3 10800 python bench.py --train --worlds 256 --init-steps 11 \
    --rollout-len 32 --num-minibatches 16 \
    --compact 4096 --compact-mode flat --obs-store split-bf16 \
    --policy-dtype bf16 --road-gather dot --fused-embed \
    --rollout-mode unroll --packed-io --agent-bucket 64 \
    --train-iters 4 --repeats 2

# Lidar at the forced R=10240 bucket, third formulation: world-group
# mapping of the dense reduction (dense OOM'd; the 40-chunk road scan hung
# the remote compiler >30 min).
run bench_lidar_r10240_v3 2700 python bench.py --worlds 64 --steps 91 \
    --repeats 3 --lidar --max-roads 10240

# IL campaign, take 3: lr 1e-3 diverged (GMM NLL oscillated 14.6->29.0->
# 11.3 on a CPU A/B; 3e-4 fell 8.97->3.56 over the same epochs).  Batch 256
# halves dispatch count vs the proven 128 at the stable lr.
run il_pool_v3c 7200 python -m gpudrive_lab_tpu.il.train \
    --data-dir data/pool_v3 --num-worlds 32 --num-batches 8 --epochs 16 \
    --batch-size 256 --lr 3e-4 --agent-bucket 32 --eval-heldout \
    --out runs/bc_pool_v3.pkl

run rnn_campaign_floor 7200 python scripts/train_rnn.py --num-worlds 64 \
    --compact 1024 --policy-dtype bf16 --obs-store bf16 --unroll \
    --agent-bucket 64 --total-timesteps 50000000 --entropy-floor 2.0 \
    --checkpoint-path runs/rnn_campaign2 --continue-training

echo "R5DCHAIN_DONE $(date)" | tee -a "$LOG/r5chain.log"
