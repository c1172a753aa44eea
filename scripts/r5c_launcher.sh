#!/bin/bash
# Starts chain C once chain B's completion marker appears in the chain log.
while ! grep -q R5BCHAIN_DONE /root/repo/bench_logs/r5chain.log 2>/dev/null; do
  sleep 30
done
sleep 10
bash /root/repo/scripts/r5c_10k_campaign.sh /root/repo/bench_logs
