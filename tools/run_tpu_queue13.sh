#!/bin/bash
# Round-4 queue13: after queue12, (a) reproduce G=4 K=16 (it beat G=6 by
# 2.4% in one run), (b) capture bench.py end-to-end with the NEW default
# K=min(T,16) to validate the flipped default + record the headline.
cd /root/repo || exit 1
LOG=logs/tpu_queue13.log
while ! grep -q "queue12 complete" logs/tpu_queue12.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue13 start" >> "$LOG"

for i in 1 2; do
  echo "$(date +%H:%M:%S) stage g4_repro_$i start" >> "$LOG"
  timeout 1800 env TM_BLOCK_G=4 TM_PREFIX_K=16 TM_VMEM_MB=0 AB_B=8 \
    python -c "
import os, sys
sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload
bb, e = workload(8)
time_variant('B=8 fused defer=ON G=4 K=16 (repro $i)', bb, e, fused=True, defer=True)
" > "logs/bench_g4_repro_$i.log" 2>&1
  echo "$(date +%H:%M:%S) DONE g4_repro_$i rc=$?" >> "$LOG"
done

echo "$(date +%H:%M:%S) stage bench_default start" >> "$LOG"
timeout 3600 python bench.py > logs/bench_newdefault.log 2>&1
echo "$(date +%H:%M:%S) DONE bench_default rc=$?" >> "$LOG"
echo "$(date +%H:%M:%S) queue13 complete" >> "$LOG"
