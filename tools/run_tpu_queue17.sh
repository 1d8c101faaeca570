#!/bin/bash
# Round-5 queue17: re-run the K-parity check with the atol-floored
# comparison + fresh-jit noise-floor control (first capture's "failures"
# were dominated by near-zero grad elements with no absolute floor).
cd /root/repo || exit 1
LOG=logs/tpu_queue17.log
while ! grep -q "queue16 complete" logs/tpu_queue16.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue17 start" >> "$LOG"

timeout 3600 python tools/check_prefix_k.py > logs/check_prefix_k2.log 2>&1
echo "$(date +%H:%M:%S) DONE check_prefix_k2 rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) queue17 complete" >> "$LOG"
