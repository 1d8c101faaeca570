#!/bin/bash
# Round-3 third TPU queue: serving with fused gather dispatch + idle-host
# torch baseline, then the embed joint bench with the fixed timing.
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
echo "$(date +%H:%M:%S) queue3 start" >> "$LOG"
run_stage() {
  name=$1; tmo=$2; shift 2
  echo "$(date +%H:%M:%S) stage $name start" >> "$LOG"
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >> "$LOG"
}
run_stage bench_infer3 2400 python tools/bench_infer.py
run_stage bench_embed3 5400 python tools/bench_embed_joint.py
echo "$(date +%H:%M:%S) queue3 complete" >> "$LOG"
