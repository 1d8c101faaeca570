#!/bin/bash
# Round-4 queue12: after queue11, confirm the K=T winner + neighborhood.
cd /root/repo || exit 1
LOG=logs/tpu_queue12.log
while ! grep -q "queue11 complete" logs/tpu_queue11.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue12 start" >> "$LOG"
timeout 7200 python tools/bench_gk_ab5.py > logs/bench_gk_ab5.log 2>&1
echo "$(date +%H:%M:%S) DONE gk_ab5 rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) queue12 complete" >> "$LOG"
