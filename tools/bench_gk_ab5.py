"""Round-4 confirmation of the K=T winner: G=6 K=16 vmem=0 measured
6.70 ms (30.51M edges/s) in bench_gk_ab4.  Reproduce it, probe the G
neighborhood at K=16, and recheck B=16 at the winning config (B=8 has
been optimal since round 2 — K=T may shift it).

  nohup python tools/bench_gk_ab5.py > logs/bench_gk_ab5.log 2>&1 &
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ONE = r"""
import os, sys
sys.path.insert(0, %r)
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload
b = int(os.environ.get("AB_B", "8"))
bb, e = workload(b)
g = os.environ["TM_BLOCK_G"]
k = os.environ["TM_PREFIX_K"]
time_variant(f"B={b} fused defer=ON G={g} K={k}", bb, e,
             fused=True, defer=True)
""" % REPO

# (B, G, K)
GRID = [
    (8, 6, 16),    # reproduce the winner
    (8, 4, 16),
    (8, 5, 16),
    (8, 8, 16),
    (16, 6, 16),   # does K=T shift the optimal batch?
    (8, 6, 16),    # second reproduction (run-to-run noise)
]


def main():
    for b, g, k in GRID:
        env = dict(os.environ, AB_B=str(b), TM_BLOCK_G=str(g),
                   TM_PREFIX_K=str(k), TM_VMEM_MB="0")
        print(f"--- B={b} G={g} K={k} ---", flush=True)
        p = subprocess.run([sys.executable, "-c", ONE], env=env, timeout=1800)
        if p.returncode != 0:
            print(f"B={b} G={g} K={k}: subprocess rc={p.returncode}",
                  flush=True)


if __name__ == "__main__":
    main()
