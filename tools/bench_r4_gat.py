"""Round-4 GAT A/B: stacked-head kernels (ops/pallas_gat.py _mh) on the
prefix-segmented step, vs the XLA attention path, at 1 and 3 heads.

Every row runs with defer-loss ON and hoisted BN ON (the round-3 table
left those settings unstated; VERDICT weak-#5).  Run ONE at a time:

  nohup python tools/bench_r4_gat.py > logs/bench_r4_gat.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from tools.bench_r3 import time_variant, workload


def main():
    import jax

    print("devices:", jax.devices(),
          "K:", os.environ.get("TM_PREFIX_K", "(default)"),
          "G:", os.environ.get("TM_BLOCK_G", "(default)"), flush=True)
    bb8, e8 = workload(8)
    time_variant("B=8 non-GAT fused defer=ON (control)", bb8, e8,
                 fused=True, defer=True)
    for h in (1, 3):
        time_variant(f"B=8 GAT{h} fused(mh kernels) defer=ON hoistBN=ON",
                     bb8, e8, fused=True, defer=True, heads=h)
        time_variant(f"B=8 GAT{h} xla defer=ON hoistBN=ON", bb8, e8,
                     fused=False, defer=True, heads=h)


if __name__ == "__main__":
    main()
