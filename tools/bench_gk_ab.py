"""Round-4 clean A/B grid: kernel grid size G x prefix segments K.

The first round-4 sweep (logs/bench_g_sweep.log) raced the step-major
refactor landing in the working tree, so its rows mix code versions.
This grid re-measures every (G, K) combination against ONE code state:

  * G: blocks per Pallas grid step, now compilable far above 6 thanks to
    vmem_limit_bytes (TM_VMEM_MB) lifting Mosaic's default 16MB budget;
  * K (TM_PREFIX_K): prefix segments of the step-major scan — K=1 is the
    round-3 behavior (every step rounds over all B*T blocks, ~half masked
    dead), K>1 never touches dead future blocks.

Each cell runs in a subprocess (both knobs are read at import).

  nohup python tools/bench_gk_ab.py > logs/bench_gk_ab.log 2>&1 &
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
time_variant(f"B=8 fused defer=ON G={g} K={k}", bb8, e8,
             fused=True, defer=True)
""" % REPO

GRID = [(6, 1), (6, 4), (16, 1), (16, 4), (16, 8), (20, 4), (24, 4)]


def main():
    for g, k in GRID:
        env = dict(os.environ, TM_BLOCK_G=str(g), TM_PREFIX_K=str(k))
        env.setdefault("TM_VMEM_MB", "110")
        print(f"--- G={g} K={k} ---", flush=True)
        p = subprocess.run([sys.executable, "-c", ONE], env=env, timeout=1800)
        if p.returncode != 0:
            print(f"G={g} K={k}: subprocess rc={p.returncode}", flush=True)


if __name__ == "__main__":
    main()
