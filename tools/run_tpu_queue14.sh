#!/bin/bash
# Round-4 queue14 (session restart): the three remaining TPU captures.
#  1. window-scale timing at B=1 with the K=min(T,16) default committed
#     (fills the B1_W20 placeholder in docs/RESULTS.md).
#  2. profile_block at production defaults -> post-K=T fusion count/ms
#     (VERDICT r3 task #6 before/after table).
#  3. bench.py driver-format capture at the new defaults.
cd /root/repo || exit 1
LOG=logs/tpu_queue14.log
echo "$(date +%H:%M:%S) queue14 start" >> "$LOG"

timeout 2400 env WS_B=1 python tools/bench_window_scale.py --skip-train \
  > logs/bench_window_scale_r4_b1.log 2>&1
echo "$(date +%H:%M:%S) DONE window_scale_b1 rc=$?" >> "$LOG"

timeout 2400 python tools/profile_block.py \
  > logs/profile_block_kT.log 2>&1
echo "$(date +%H:%M:%S) DONE profile_block_kT rc=$?" >> "$LOG"

timeout 2400 python bench.py > logs/bench_r4_capture.log 2>&1
echo "$(date +%H:%M:%S) DONE bench rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) queue14 complete" >> "$LOG"
