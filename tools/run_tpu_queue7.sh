#!/bin/bash
# Round-3 queue7: embed-net bf16 conv A/B (sets --embed-bf16 default by
# data) + confirmation that the reverted 3H-concat kernel reproduces
# 12.39 ms at default G=4.  One TPU client at a time.
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
echo "$(date +%H:%M:%S) queue7 start" >> "$LOG"
echo "$(date +%H:%M:%S) stage bench_g4_confirm start" >> "$LOG"
timeout 1800 python tools/bench_g.py > logs/bench_g4_confirm.log 2>&1
echo "$(date +%H:%M:%S) DONE bench_g4_confirm rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) stage bench_embed_bf16 start" >> "$LOG"
timeout 3600 python tools/bench_embed_bf16.py > logs/bench_embed_bf16.log 2>&1
echo "$(date +%H:%M:%S) DONE bench_embed_bf16 rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) queue7 complete" >> "$LOG"
