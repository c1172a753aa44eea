#!/bin/bash
# Resumable PPO training campaign (VERDICT r1 item 4).
#
# Runs the train CLI toward a target step count in crash-tolerant chunks:
# the CLI itself loops until --total-timesteps, and --continue-training
# restores policy + Adam state + global_step from <dir>/policy.pkl, so the
# wrapper only needs to restart after tunnel hiccups.  Progress (goal rate,
# entropy, SPS) streams to <dir>/ppo.jsonl.
#
# Usage: scripts/ppo_campaign.sh [target_steps] [run_dir]

set -u
TARGET=${1:-50000000}
DIR=${2:-runs/campaign}
CHUNK_TIMEOUT=${CHUNK_TIMEOUT:-5400}

mkdir -p "$DIR"
while :; do
  done_steps=$(python - "$DIR" <<'EOF'
import pickle, sys
from pathlib import Path
p = Path(sys.argv[1]) / "policy.pkl"
try:
    print(int(pickle.load(open(p, "rb")).get("global_step", 0)))
except Exception:
    print(0)
EOF
)
  echo "[campaign] at ${done_steps}/${TARGET} agent-steps" >&2
  if [ "$done_steps" -ge "$TARGET" ]; then
    echo "[campaign] target reached" >&2
    break
  fi
  # Hyperparameters mirror ppo_base_puffer.yaml: effective batch
  # W*compact*T = 64*64*32 = 131072 == their batch_size, minibatch
  # 131072/16 = 8192, update_epochs 4, lr 3e-4, gamma/lambda/clip defaults,
  # init_steps 11 (episodes start at t=11 after expert log playback).
  # Deviations: ent_coef 1e-3 + entropy floor (their 1e-4 collapsed at ~1M
  # steps in round-1 runs), no resampling (the example batch has 4 unique
  # scenes — swapping re-tiles the same set).
  timeout "$CHUNK_TIMEOUT" python -m gpudrive_lab_tpu.ppo.train \
    --num-worlds "${NUM_WORLDS:-64}" --rollout-len 32 \
    --num-minibatches "${NUM_MINIBATCHES:-16}" \
    --compact "${COMPACT:-64}" --compact-mode "${COMPACT_MODE:-world}" \
    --policy-dtype "${POLICY_DTYPE:-f32}" \
    --obs-store bf16 --rollout-mode unroll \
    --entropy-floor "${ENTROPY_FLOOR:-0.8}" --ent-coef 1e-3 \
    --init-steps "${INIT_STEPS:-11}" \
    --iters-per-dispatch "${ITERS_PER_DISPATCH:-1}" \
    ${PACKED_IO:+--packed-io} \
    ${DATA_DIR:+--data-dir "$DATA_DIR"} \
    ${AGENT_BUCKET:+--agent-bucket "$AGENT_BUCKET"} \
    ${MAX_ROADS:+--max-roads "$MAX_ROADS"} \
    ${ROAD_GATHER:+--road-gather "$ROAD_GATHER"} \
    ${EPOCH_PRESHUFFLE:+--epoch-preshuffle} \
    ${KEEP_NON_VEHICLES:+--keep-non-vehicles} \
    ${COMPACT_BLOCKS:+--compact-blocks "$COMPACT_BLOCKS"} \
    ${OBS_STORE_OVERRIDE:+--obs-store "$OBS_STORE_OVERRIDE"} \
    --resample-interval "${RESAMPLE_INTERVAL:-0}" \
    --checkpoint-interval 25 \
    --total-timesteps "$TARGET" \
    --checkpoint-path "$DIR" --continue-training
  rc=$?
  if [ "$rc" -eq 0 ]; then
    break
  fi
  echo "[campaign] chunk exited rc=$rc; restarting in 60 s" >&2
  sleep 60
done
