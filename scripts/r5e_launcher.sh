#!/bin/bash
while ! grep -q R5DCHAIN_DONE /root/repo/bench_logs/r5chain.log 2>/dev/null; do
  sleep 30
done
sleep 10
bash /root/repo/scripts/r5e_10k_continue.sh /root/repo/bench_logs
