#!/bin/bash
# Waits for the chain-A shell (campaign v3 + evals) to exit, then runs chain B.
while kill -0 "$1" 2>/dev/null; do sleep 20; done
sleep 10
bash /root/repo/scripts/r5b_throughput_chain.sh /root/repo/bench_logs
