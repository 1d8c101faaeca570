#!/bin/bash
# Round-3 queue8: (a) bf16 ga/gb streaming A/B (TM_GAB_F32=1 = f32 control),
# (b) grid-size bisect G=5/6 on the settled 3H-concat kernel (G=8 fails:
# VMEM or toolchain?).  Waits for queue7 (one TPU client at a time).
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
while ps -p "$(cat logs/queue_pid.txt)" > /dev/null 2>&1; do sleep 20; done
echo "$(date +%H:%M:%S) queue8 start" >> "$LOG"
for spec in "bench_gab16:" "bench_gab_f32:TM_GAB_F32=1" \
            "bench_g5:TM_BLOCK_G=5" "bench_g6:TM_BLOCK_G=6"; do
  STAGE="${spec%%:*}"; ENVV="${spec#*:}"
  echo "$(date +%H:%M:%S) stage $STAGE start" >> "$LOG"
  if [ -n "$ENVV" ]; then
    timeout 1800 env "$ENVV" python tools/bench_g.py > "logs/$STAGE.log" 2>&1
  else
    timeout 1800 python tools/bench_g.py > "logs/$STAGE.log" 2>&1
  fi
  echo "$(date +%H:%M:%S) DONE $STAGE rc=$?" >> "$LOG"
done
echo "$(date +%H:%M:%S) queue8 complete" >> "$LOG"
