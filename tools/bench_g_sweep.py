"""Round-4 grid-size sweep with a raised Mosaic scoped-VMEM budget.

Round 3 settled G=6 because G>=7 failed to compile — but against Mosaic's
DEFAULT 16MB scoped-VMEM limit, not the v5e's 128MB of physical VMEM.
vmem_limit_bytes (pltpu.CompilerParams) raises the budget; this sweep
re-runs the production fused step at G = 6..32 to find the new optimum.
Each G runs in a SUBPROCESS (TM_BLOCK_G is read at import) so one compile
failure doesn't kill the sweep.

  nohup python tools/bench_g_sweep.py > logs/bench_g_sweep.log 2>&1 &
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
v = os.environ.get("TM_VMEM_MB", "110")
time_variant(f"B=8 fused defer=ON G={g} vmem={v}MB", bb8, e8,
             fused=True, defer=True)
""" % REPO


def main():
    gs = [int(g) for g in os.environ.get("SWEEP_G", "8 12 16 24 32").split()]
    for g in gs:
        env = dict(os.environ, TM_BLOCK_G=str(g))
        env.setdefault("TM_VMEM_MB", "110")
        print(f"--- G={g} vmem={env['TM_VMEM_MB']}MB ---", flush=True)
        p = subprocess.run([sys.executable, "-c", ONE], env=env, timeout=1200)
        if p.returncode != 0:
            print(f"G={g}: subprocess rc={p.returncode}", flush=True)


if __name__ == "__main__":
    main()
