"""Round-4 finish of the G x K x VMEM grid (bench_gk_ab3 died mid-sweep
at the snapshot): the standout row was G=16 K=16 vmem=110 -> 7.61 ms
(26.85M edges/s) vs the committed default G=6 K=4 vmem=0 -> 8.50 ms.
K=16 == T at bench shapes: fully per-step-specialized prefix segments,
zero dead blocks.  This reruns that winner (reproduction), the cut-off
cells, and the neighborhood, one subprocess per cell.

  nohup python tools/bench_gk_ab4.py > logs/bench_gk_ab4.log 2>&1 &
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
bb8, e8 = workload(8)
g = os.environ["TM_BLOCK_G"]
k = os.environ["TM_PREFIX_K"]
v = os.environ.get("TM_VMEM_MB", "0")
time_variant(f"B=8 fused defer=ON G={g} K={k} vmem={v}", bb8, e8,
             fused=True, defer=True)
""" % REPO

# (G, K, vmem_mb)
GRID = [
    (16, 16, 110),   # reproduce the 7.61 ms standout
    (6, 16, 0),      # the cell the dead run was on
    (16, 16, 0),     # is it K=16 or the vmem budget?
    (8, 16, 110),
    (24, 16, 110),
    (16, 8, 110),    # vs the 10.09 G=8 K=8 row: K or G?
]


def main():
    for g, k, v in GRID:
        env = dict(os.environ, TM_BLOCK_G=str(g), TM_PREFIX_K=str(k),
                   TM_VMEM_MB=str(v))
        print(f"--- G={g} K={k} vmem={v} ---", flush=True)
        p = subprocess.run([sys.executable, "-c", ONE], env=env, timeout=1800)
        if p.returncode != 0:
            print(f"G={g} K={k} vmem={v}: subprocess rc={p.returncode}",
                  flush=True)


if __name__ == "__main__":
    main()
