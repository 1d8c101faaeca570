#!/bin/bash
# Round-5 queue16: (a) on-chip K=T numerics pin (loss/grad K=1 vs 4 vs 16,
# VERDICT r4 task #4); (b) merged deferred-loss A/B at production defaults
# (the round-5 fusion-count fix); (c) GAT table with the compile fallback
# (GAT3 must fall back instead of crash, task #2).
cd /root/repo || exit 1
LOG=logs/tpu_queue16.log
echo "$(date +%H:%M:%S) queue16 start" >> "$LOG"

timeout 3600 python tools/check_prefix_k.py > logs/check_prefix_k.log 2>&1
echo "$(date +%H:%M:%S) DONE check_prefix_k rc=$?" >> "$LOG"

timeout 3600 python -c "
import os, sys
sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload
bb, e = workload(8)
time_variant('B=8 fused defer=ON MERGED loss (r5 default)', bb, e,
             fused=True, defer=True)
os.environ['TM_SPLIT_LOSS'] = '1'
time_variant('B=8 fused defer=ON split loss (r4 behavior)', bb, e,
             fused=True, defer=True)
del os.environ['TM_SPLIT_LOSS']
bb16, e16 = workload(16)
time_variant('B=16 fused defer=ON MERGED loss', bb16, e16,
             fused=True, defer=True)
" > logs/bench_merged_loss.log 2>&1
echo "$(date +%H:%M:%S) DONE merged_loss_ab rc=$?" >> "$LOG"

timeout 5400 python tools/bench_r4_gat.py > logs/bench_r5_gat.log 2>&1
echo "$(date +%H:%M:%S) DONE gat rc=$?" >> "$LOG"

echo "$(date +%H:%M:%S) queue16 complete" >> "$LOG"
