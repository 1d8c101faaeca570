#!/bin/bash
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
echo "$(date +%H:%M:%S) queue4 start" >> "$LOG"
timeout 5400 python tools/bench_embed_ab.py > logs/bench_embed_ab.log 2>&1
echo "$(date +%H:%M:%S) DONE bench_embed_ab rc=$?" >> "$LOG"
