#!/bin/bash
# Round-5 queue18: (a) the committed GAT table at production defaults
# (split loss restored; GAT3 exercises the live fallback) — the artifact
# VERDICT r4 task #3 asked for; (b) TOP_RAW fusion profiles for the
# launch-overhead hunt (task #6) and the GAT1 irreducible-cost naming.
cd /root/repo || exit 1
LOG=logs/tpu_queue18.log
while ! grep -q "queue17 complete" logs/tpu_queue17.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue18 start" >> "$LOG"

timeout 5400 python tools/bench_r4_gat.py > logs/bench_r5_gat_final.log 2>&1
echo "$(date +%H:%M:%S) DONE gat_final rc=$?" >> "$LOG"

timeout 3600 env TOP_RAW=1 TOPK=30 python tools/profile_block.py \
  > logs/profile_block_r5.log 2>&1
echo "$(date +%H:%M:%S) DONE profile_raw rc=$?" >> "$LOG"

timeout 3600 env TOP_RAW=1 TOPK=30 NATT=1 python tools/profile_block.py \
  > logs/profile_gat1_r5.log 2>&1
echo "$(date +%H:%M:%S) DONE profile_gat1 rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) queue18 complete" >> "$LOG"
