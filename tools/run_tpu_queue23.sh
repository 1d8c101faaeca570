#!/bin/bash
# Round-5 queue23: A/B the scatter-kernel COMPOSITION (TM_ES_KERNEL=2:
# window_scatter for es + window_gather2 VJP for ga/gb) against the r4
# XLA-scatter path, then profile the winner.
cd /root/repo || exit 1
LOG=logs/tpu_queue23.log
echo "$(date +%H:%M:%S) queue23 start" >> "$LOG"

timeout 3600 python -c "
import os, sys
sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload
bb, e = workload(8)
os.environ['TM_ES_KERNEL'] = '0'
time_variant('B=8 fused defer=ON XLA-scatter (r4 prod)', bb, e,
             fused=True, defer=True)
os.environ['TM_ES_KERNEL'] = '2'
time_variant('B=8 fused defer=ON SCATTER-KERNEL compose (r5)', bb, e,
             fused=True, defer=True)
time_variant('B=8 compose (repeat)', bb, e, fused=True, defer=True)
bb16, e16 = workload(16)
time_variant('B=16 fused defer=ON compose', bb16, e16, fused=True,
             defer=True)
" > logs/bench_es_compose.log 2>&1
echo "$(date +%H:%M:%S) DONE compose_ab rc=$?" >> "$LOG"

if grep -q "compose (r5): [0-9]" logs/bench_es_compose.log; then
  timeout 3600 env TOP_RAW=1 TOPK=25 python tools/profile_block.py \
    > logs/profile_block_compose.log 2>&1
  echo "$(date +%H:%M:%S) DONE profile_compose rc=$?" >> "$LOG"
fi

echo "$(date +%H:%M:%S) queue23 complete" >> "$LOG"
