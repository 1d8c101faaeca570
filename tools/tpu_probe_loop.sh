#!/bin/bash
# Retry a tiny TPU jit through the tunnel until it succeeds; append each
# attempt to the log.  Kills only its own child PID (never by pattern).
LOG=${1:-/root/repo/logs/tpu_probe_loop.log}
while true; do
  echo "$(date +%H:%M:%S) probe attempt..." >> "$LOG"
  timeout 180 python -c "
import sys, time
sys.path.insert(0, '/root/repo')
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu'
f = jax.jit(lambda a: jnp.tanh(a @ a + 0.125).sum())
print('PROBE_OK', float(f(jnp.ones((128,128)))), jax.default_backend(), flush=True)
" >> "$LOG" 2>&1
  rc=$?
  echo "$(date +%H:%M:%S) rc=$rc" >> "$LOG"
  if [ $rc -eq 0 ]; then echo "$(date +%H:%M:%S) TUNNEL UP" >> "$LOG"; exit 0; fi
  sleep 240
done
