#!/bin/bash
# Round-4 queue9: after the GAT A/B (bench_r4_gat2), run the remaining
# verdict measurements one TPU client at a time:
#   (a) K=1 serving latency breakdown          (VERDICT task #8)
#   (b) window-scale timing at win 5/10/20     (task #5 "measure at win 5/20")
#   (c) block-step op profile post step-major  (task #6 fusion census)
cd /root/repo || exit 1
LOG=logs/tpu_queue9.log
GAT_PID=$(sed 's/gat_pid=//' logs/bench_r4_gat2.pid)
while ps -p "$GAT_PID" > /dev/null 2>&1; do sleep 20; done
echo "$(date +%H:%M:%S) queue9 start" >> "$LOG"

echo "$(date +%H:%M:%S) stage infer_k1 start" >> "$LOG"
timeout 2400 python tools/profile_infer_k1.py > logs/profile_infer_k1.log 2>&1
echo "$(date +%H:%M:%S) DONE infer_k1 rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) stage window_scale start" >> "$LOG"
timeout 2400 python tools/bench_window_scale.py --skip-train \
  > logs/bench_window_scale_r4.log 2>&1
echo "$(date +%H:%M:%S) DONE window_scale rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) stage profile_block start" >> "$LOG"
timeout 2400 env FUSED=1 BF16=1 python tools/profile_block.py \
  > logs/profile_block_r4.log 2>&1
echo "$(date +%H:%M:%S) DONE profile_block rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) queue9 complete" >> "$LOG"
