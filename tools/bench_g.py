"""One production block-step timing at the current TM_BLOCK_G (read at
import by ops/pallas_block.py).  Round-3 question: G=8 halves kernel
launches and only OOM'd VMEM in the backward under scan remat, which the
fused path no longer uses - does it beat G=4 now?"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from trackmpnn_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from tools.bench_r3 import time_variant, workload

bb8, e8 = workload(8)
g = os.environ.get("TM_BLOCK_G", "4")
time_variant(f"B=8 fused defer=ON G={g}", bb8, e8, fused=True, defer=True)
