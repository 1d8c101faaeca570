#!/bin/bash
# Round-3: grid-size sweep for the slice-wise fused round kernel
# (ops/pallas_block.py rewrite removed the 3H-wide rectangle buffers that
# OOM'd G=8's backward).  One TPU client at a time.
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
echo "$(date +%H:%M:%S) queue6 start" >> "$LOG"
for G in 4 8 8,4 16,8 16 24,12; do
  name="bench_gs_${G/,/x}"
  echo "$(date +%H:%M:%S) stage $name start" >> "$LOG"
  TM_BLOCK_G=$G timeout 1800 python tools/bench_g.py > "logs/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >> "$LOG"
done
echo "$(date +%H:%M:%S) queue6 complete" >> "$LOG"
