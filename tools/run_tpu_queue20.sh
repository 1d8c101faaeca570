#!/bin/bash
# Round-5 queue20: hunt a COMPILING grid for the 3-head fused GAT kernels
# (TM_GAT_G sweep, fallback disabled so failures report as FAIL), then
# time the best compiling config.
cd /root/repo || exit 1
LOG=logs/tpu_queue20.log
while ! grep -q "queue19 complete" logs/tpu_queue19.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue20 start" >> "$LOG"

for g in 4 2 16; do
  timeout 2400 env TM_GAT_FALLBACK=0 TM_GAT_G=$g python -c "
import os, sys
sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload
bb, e = workload(8)
time_variant('B=8 GAT3 fused TM_GAT_G=$g', bb, e, fused=True, defer=True,
             heads=3)
" > "logs/bench_gat3_g$g.log" 2>&1
  echo "$(date +%H:%M:%S) DONE gat3_g$g rc=$?" >> "$LOG"
done

echo "$(date +%H:%M:%S) queue20 complete" >> "$LOG"
