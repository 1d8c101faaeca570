#!/bin/bash
# Round-3 TPU work queue: waits for the tunnel (tools/tpu_probe_loop.sh
# semantics inline), then runs every on-chip measurement ONE AT A TIME.
# Logs land in logs/.  Safe to restart; each stage skips if its log already
# ends with its DONE marker.
cd /root/repo || exit 1
LOG=logs/tpu_queue.log
echo "$(date +%H:%M:%S) queue start" >> "$LOG"

probe() {
  timeout 240 python -c "
import sys; sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu'
f = jax.jit(lambda a: jnp.tanh(a @ a + 0.125).sum())
print(float(f(jnp.ones((128,128)))))
" > /dev/null 2>&1
}

until probe; do
  echo "$(date +%H:%M:%S) tunnel still down" >> "$LOG"
  sleep 240
done
echo "$(date +%H:%M:%S) TUNNEL UP - running queue" >> "$LOG"

run_stage() {  # name, timeout_s, command...
  name=$1; tmo=$2; shift 2
  if grep -q "DONE $name" "$LOG" 2>/dev/null; then
    echo "skip $name (done)" >> "$LOG"; return
  fi
  echo "$(date +%H:%M:%S) stage $name start" >> "$LOG"
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  rc=$?
  echo "$(date +%H:%M:%S) DONE $name rc=$rc" >> "$LOG"
}

export BENCH_PROBE_S=600
run_stage bench_r3_ab    3600 python tools/bench_r3.py
run_stage bench_main     2400 python bench.py
run_stage bench_infer    2400 python tools/bench_infer.py
run_stage bench_winscale 3600 python tools/bench_window_scale.py --skip-train
run_stage bench_embed    5400 python tools/bench_embed_joint.py
echo "$(date +%H:%M:%S) queue complete" >> "$LOG"
