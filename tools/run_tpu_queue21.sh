#!/bin/bash
# Round-5 queue21: on-chip A/B of the scatter-free round (TM_ES_KERNEL):
# the round-5 profile showed ~1.2 ms of the 6.54 ms step is XLA
# scatter-adds/gathers around the kernel; the es variant moves them
# in-kernel as per-window one-hot matmuls.  Then a TOP_RAW profile of the
# winner and a G sweep for the new kernel.
cd /root/repo || exit 1
LOG=logs/tpu_queue21.log
while ! grep -q "queue20 complete" logs/tpu_queue20.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue21 start" >> "$LOG"

timeout 3600 python -c "
import os, sys
sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload
bb, e = workload(8)
os.environ['TM_ES_KERNEL'] = '0'
time_variant('B=8 fused defer=ON partials+XLA-scatter (r4 prod)', bb, e,
             fused=True, defer=True)
os.environ['TM_ES_KERNEL'] = '1'
time_variant('B=8 fused defer=ON ES-KERNEL (r5)', bb, e,
             fused=True, defer=True)
bb16, e16 = workload(16)
time_variant('B=16 fused defer=ON ES-KERNEL', bb16, e16, fused=True,
             defer=True)
" > logs/bench_es_kernel.log 2>&1
echo "$(date +%H:%M:%S) DONE es_ab rc=$?" >> "$LOG"

timeout 3600 env TOP_RAW=1 TOPK=25 python tools/profile_block.py \
  > logs/profile_block_es.log 2>&1
echo "$(date +%H:%M:%S) DONE profile_es rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) queue21 complete" >> "$LOG"
