#!/bin/bash
# Poll the TPU tunnel until it answers, then run the close-out runbook.
# Run inside tmux (detached setsid/nohup processes cannot register the TPU
# backend — CLAUDE.md environment traps).  Never restarts the relay.
#
# Usage: scripts/tpu_poll_then_runbook.sh [logdir]

set -u
LOG=${1:-bench_logs}
mkdir -p "$LOG"

echo "poller start $(date)" | tee -a "$LOG/poll.log"
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU up at $(date)" | tee -a "$LOG/poll.log"
    break
  fi
  echo "down $(date +%H:%M:%S)" >> "$LOG/poll.log"
  sleep 120
done

bash scripts/tpu_runbook.sh "$LOG"
echo "RUNBOOK_DONE $(date)" | tee -a "$LOG/poll.log"

# Launch the 50M-step campaign immediately — it is the long pole and is
# resumable, so a suboptimal first chunk costs nothing.
bash scripts/ppo_campaign.sh 50000000 runs/campaign >"$LOG/campaign.log" 2>&1
echo "CAMPAIGN_DONE $(date)" | tee -a "$LOG/poll.log"

bash scripts/tpu_post_campaign.sh "$LOG"
echo "ALL_DONE $(date)" | tee -a "$LOG/poll.log"
