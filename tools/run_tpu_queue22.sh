#!/bin/bash
# Round-5 queue22: es-kernel A/B retry after the 3D act/new block-shape
# fix (2D [G,na] blocks violate Mosaic's (8,128) rule — interpret mode
# doesn't check).  Profile the winner if it compiles.
cd /root/repo || exit 1
LOG=logs/tpu_queue22.log
while ! grep -q "queue21 complete" logs/tpu_queue21.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue22 start" >> "$LOG"

timeout 3600 python -c "
import os, sys
sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload
bb, e = workload(8)
os.environ['TM_ES_KERNEL'] = '1'
time_variant('B=8 fused defer=ON ES-KERNEL (r5, 3D idx)', bb, e,
             fused=True, defer=True)
time_variant('B=8 fused defer=ON ES-KERNEL (repeat)', bb, e,
             fused=True, defer=True)
bb16, e16 = workload(16)
time_variant('B=16 fused defer=ON ES-KERNEL', bb16, e16, fused=True,
             defer=True)
" > logs/bench_es_kernel2.log 2>&1
echo "$(date +%H:%M:%S) DONE es_ab2 rc=$?" >> "$LOG"

if grep -q "ES-KERNEL (r5, 3D idx): [0-9]" logs/bench_es_kernel2.log; then
  timeout 3600 env TOP_RAW=1 TOPK=25 python tools/profile_block.py \
    > logs/profile_block_es.log 2>&1
  echo "$(date +%H:%M:%S) DONE profile_es rc=$?" >> "$LOG"
fi

echo "$(date +%H:%M:%S) queue22 complete" >> "$LOG"
