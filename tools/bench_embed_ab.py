"""Focused dla34 embed A/B: DCN impl x frame_chunk at KITTI shapes.

Round-3 finding that motivated this: at whole-joint-step scale the exact
gather (frame_chunk=1) beat the shift warp (unchunked) 2469 vs 4856 ms --
REVERSING the per-layer bench (shift R=2 was 1.8x faster per layer at N=1,
tools/bench_deform.py).  This maps the (impl, chunk, R) space to pick the
production default.  Run ONE at a time (single-client tunnel).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bench_embed_joint import bench_embed_step  # noqa: E402

VARIANTS = [
    ("shift R=2 unchunked", dict(dcn_max_offset=2.0)),
    ("shift R=2 chunk=1",   dict(dcn_max_offset=2.0, frame_chunk=1)),
    ("shift R=1 unchunked", dict(dcn_max_offset=1.0)),
    ("gather chunk=1",      dict(dcn_max_offset=None, frame_chunk=1)),
    ("gather chunk=2",      dict(dcn_max_offset=None, frame_chunk=2)),
]
for name, kw in VARIANTS:
    try:
        sec = bench_embed_step("dla34", **kw)
        print(f"dla34 {name}: {sec*1e3:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"dla34 {name}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
