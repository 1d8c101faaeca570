#!/bin/bash
# Round-4 queue10: after queue9, finish the G x K x VMEM grid (the
# snapshot killed bench_gk_ab3 mid-sweep; G=16 K=16 vmem=110 showed
# 7.61 ms and needs reproduction + neighborhood).
cd /root/repo || exit 1
LOG=logs/tpu_queue10.log
while ! grep -q "queue9 complete" logs/tpu_queue9.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue10 start" >> "$LOG"
timeout 7200 python tools/bench_gk_ab4.py > logs/bench_gk_ab4.log 2>&1
echo "$(date +%H:%M:%S) DONE gk_ab4 rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) queue10 complete" >> "$LOG"
