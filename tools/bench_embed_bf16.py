"""bf16-conv A/B for the joint embed train step (BASELINE config 5 follow-up).

Round-3 RESULTS put the dla34 joint step at 2467 ms/chunk and espv2 at
378 — entirely backbone-bound.  The DCN gather sits on the serialization
floor regardless of dtype, but every conv and the im2col contraction can
feed the MXU in bf16 (backbones/layers.py conv_compute).  This measures
f32 vs bf16 for both archs so the --embed-bf16 default is set by data.

Run ONE at a time on the chip:
  nohup python tools/bench_embed_bf16.py > logs/bench_embed_bf16.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from trackmpnn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tools.bench_embed_joint import FRAMES, HW, bench_embed_step  # noqa: E402


def main():
    print("devices:", jax.devices(), "HW:", HW, "frames:", FRAMES, flush=True)
    for arch, kw in (("espv2", {}),
                     ("dla34", dict(dcn_max_offset=None, frame_chunk=1))):
        for dt in (None, "bfloat16"):
            tag = f"{arch} conv={'bf16' if dt else 'f32'}"
            try:
                sec = bench_embed_step(arch, conv_dtype=dt, **kw)
            except Exception as e:  # noqa: BLE001
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            print(f"{tag}: {sec*1e3:.1f} ms/chunk "
                  f"({FRAMES/sec:.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
