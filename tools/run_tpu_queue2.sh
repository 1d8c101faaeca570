#!/bin/bash
# Round-3 second TPU queue: serving re-measure (device-resident hidden) and
# the fixed embed joint bench.  One client at a time; logs in logs/.
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
echo "$(date +%H:%M:%S) queue2 start" >> "$LOG"
run_stage() {
  name=$1; tmo=$2; shift 2
  echo "$(date +%H:%M:%S) stage $name start" >> "$LOG"
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) DONE $name rc=$?" >> "$LOG"
}
run_stage bench_infer2 2400 python tools/bench_infer.py
run_stage bench_embed2 5400 python tools/bench_embed_joint.py
echo "$(date +%H:%M:%S) queue2 complete" >> "$LOG"
