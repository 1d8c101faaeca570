#!/bin/bash
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
echo "$(date +%H:%M:%S) queue5 start" >> "$LOG"
echo "$(date +%H:%M:%S) stage bench_g4 start" >> "$LOG"
TM_BLOCK_G=4 timeout 1800 python tools/bench_g.py > logs/bench_g4.log 2>&1
echo "$(date +%H:%M:%S) DONE bench_g4 rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) stage bench_g8 start" >> "$LOG"
TM_BLOCK_G=8 timeout 1800 python tools/bench_g.py > logs/bench_g8.log 2>&1
echo "$(date +%H:%M:%S) DONE bench_g8 rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) queue5 complete" >> "$LOG"
