#!/bin/bash
# Round-4 queue11: after queue10, window-scale timing at B=1 (the exact
# round-3 table config) so the r3->r4 comparison is apples-to-apples.
cd /root/repo || exit 1
LOG=logs/tpu_queue11.log
while ! grep -q "queue10 complete" logs/tpu_queue10.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue11 start" >> "$LOG"
timeout 2400 env WS_B=1 python tools/bench_window_scale.py --skip-train \
  > logs/bench_window_scale_r4_b1.log 2>&1
echo "$(date +%H:%M:%S) DONE window_scale_b1 rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) queue11 complete" >> "$LOG"
