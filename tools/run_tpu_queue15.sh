#!/bin/bash
# Round-4 queue15: re-capture the K=T evidence whose logs were lost when
# the tunnel hang killed queues 11-13 (bench_gk_ab4/5 never landed on
# disk).  Runs the confirmation sweep (winner repro + G neighborhood +
# B=16 recheck) and the two G=4 K=16 reproductions.
cd /root/repo || exit 1
LOG=logs/tpu_queue15.log
while ! grep -q "queue14 complete" logs/tpu_queue14.log 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) queue15 start" >> "$LOG"

timeout 7200 python tools/bench_gk_ab5.py > logs/bench_gk_ab5.log 2>&1
echo "$(date +%H:%M:%S) DONE gk_ab5 rc=$?" >> "$LOG"

for i in 1 2; do
  timeout 1800 env TM_BLOCK_G=4 TM_PREFIX_K=16 TM_VMEM_MB=0 python -c "
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

echo "$(date +%H:%M:%S) queue15 complete" >> "$LOG"
