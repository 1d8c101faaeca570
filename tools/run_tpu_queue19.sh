#!/bin/bash
# Round-5 queue19: K-parity check, third pass — global-scale atol (the
# per-leaf floor still flagged zero-grad leaves, see check_prefix_k2.log).
cd /root/repo || exit 1
LOG=logs/tpu_queue19.log
while ! grep -q "queue18 complete" logs/tpu_queue18.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue19 start" >> "$LOG"

timeout 3600 python tools/check_prefix_k.py > logs/check_prefix_k3.log 2>&1
echo "$(date +%H:%M:%S) DONE check_prefix_k3 rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) queue19 complete" >> "$LOG"
