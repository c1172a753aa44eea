#!/bin/bash
# Long-horizon PPO campaign in resumable chunks (VERDICT r1 item 4).
#
# The tunnel TPU worker occasionally faults on long-running programs, so the
# campaign runs as bounded chunks under `timeout`, each resuming policy +
# Adam state from the checkpoint (--continue-training); a fault costs at
# most one chunk.  Goal-rate curve accumulates in
# <ckpt>/ppo.metrics.jsonl.
#
# Usage: scripts/run_ppo_campaign.sh [total_steps] [ckpt_dir] [chunk_secs]
set -u

TOTAL=${1:-50000000}
CKPT=${2:-runs/campaign}
CHUNK=${3:-1500}
WORLDS=${4:-64}
MODE=${5:-dispatch}

mkdir -p "$CKPT"
for i in $(seq 1 200); do
  done_steps=$(python - "$CKPT" <<'EOF'
import json, sys, os
p = os.path.join(sys.argv[1], "policy.pkl")
if not os.path.exists(p):
    print(0); raise SystemExit
import pickle
with open(p, "rb") as f:
    print(int(pickle.load(f).get("global_step", 0)))
EOF
)
  echo "[campaign] chunk $i, resumed at ${done_steps} / ${TOTAL} steps"
  if [ "$done_steps" -ge "$TOTAL" ]; then
    echo "[campaign] target reached"
    break
  fi
  timeout "$CHUNK" python -m gpudrive_lab_tpu.ppo.train \
    --num-worlds "$WORLDS" \
    --total-timesteps "$TOTAL" \
    --rollout-len 32 \
    --rollout-mode "$MODE" \
    --num-minibatches 8 \
    --entropy-floor 1.0 \
    --checkpoint-path "$CKPT" \
    --checkpoint-interval 20 \
    --resample-interval 2000000 \
    --continue-training
  rc=$?
  echo "[campaign] chunk $i exited rc=$rc"
  sleep 30  # let a faulted worker recover before the next chunk
done

python - "$CKPT" <<'EOF'
import json, sys, os
path = os.path.join(sys.argv[1], "ppo.metrics.jsonl")
rows = [json.loads(l) for l in open(path)] if os.path.exists(path) else []
rows = [r for r in rows if "global_step" in r]
print(json.dumps({
    "chunks_logged": len(rows),
    "final_step": rows[-1]["global_step"] if rows else 0,
    "final_goal_rate": rows[-1].get("perc_goal_achieved") if rows else None,
    "final_entropy": rows[-1].get("entropy") if rows else None,
}))
EOF
