"""On-chip bench of the XLA deformable-conv decomposition (VERDICT r1 #3).

Times `backbones.deform_conv.apply_dcn` (offset conv + bilinear gather +
MXU contraction) at the reference's DLA-34 usage shapes
(/root/reference/models/dla/pose_dla_dcn.py:345-357: every DLAUp/IDAUp
proj/node block, KITTI 1242x375 input, first_level=2) against a plain
3x3 conv with identical channels — the roofline context for what the
deformable sampling costs on top of pure MXU work.

Each repeat uses a DIFFERENT input (single-op repeats through the tunnel
are memoized; see CLAUDE.md).  Run: nohup python tools/bench_deform.py.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from trackmpnn_tpu.backbones import deform_conv as DC
from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # warm tunnel compiles across runs

# (cin, cout, H, W): DLAUp proj/node blocks at strides 16/8/4 + the largest
# IDAUp stage.  KITTI 1242x375 -> stride-4 map 94x311 (ceil), stride-8
# 47x156, stride-16 24x78.
SHAPES = [
    (512, 256, 24, 78),
    (256, 128, 47, 156),
    (128, 64, 94, 311),
    (64, 64, 94, 311),
]
NREP = 8


def conv3x3(w, x):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def timed(fn, args_list):
    jax.block_until_ready(fn(*args_list[0]))  # warmup/compile
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(args_list)


def main():
    print("devices:", jax.devices())
    rows = []
    for cin, cout, H, W in SHAPES:
        key = jax.random.key(hash((cin, H)) % 2**31)
        params = DC.init_dcn(key, cin, cout)
        # random (non-zero) offset branch so sampling is truly deformable
        params["offset_weight"] = 0.01 * jax.random.normal(
            key, params["offset_weight"].shape
        )
        xs = [
            jax.random.normal(jax.random.key(i), (1, H, W, cin), jnp.float32)
            for i in range(NREP)
        ]
        wc = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05

        dcn_f = jax.jit(functools.partial(DC.apply_dcn, params))
        t_dcn = timed(dcn_f, [(x,) for x in xs])

        def dcn_loss(p, x):
            return jnp.sum(DC.apply_dcn(p, x) ** 2)

        dcn_g = jax.jit(jax.value_and_grad(dcn_loss))
        t_dcn_bwd = timed(dcn_g, [(params, x) for x in xs])

        conv_f = jax.jit(functools.partial(conv3x3, wc))
        t_conv = timed(conv_f, [(x,) for x in xs])

        def conv_loss(w, x):
            return jnp.sum(conv3x3(w, x) ** 2)

        conv_g = jax.jit(jax.value_and_grad(conv_loss))
        t_conv_bwd = timed(conv_g, [(wc, x) for x in xs])

        shift_ts = {}
        try:
            from trackmpnn_tpu.ops.pallas_dcn import deform_conv2d_shift_pallas

            def pallas_dcn(p, x1):
                om = jax.lax.conv_general_dilated(
                    x1[None], p["offset_weight"], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )[0] + p["offset_bias"]
                return deform_conv2d_shift_pallas(
                    x1, p["weight"], p["bias"], om[..., :18],
                    jax.nn.sigmoid(om[..., 18:]), max_offset=4.0)

            pf = jax.jit(functools.partial(pallas_dcn, params))
            shift_ts["pallas_r4_fwd_us"] = round(
                timed(pf, [(x[0],) for x in xs]) * 1e6, 1)
        except Exception as e:  # Mosaic lowering failure -> record it
            shift_ts["pallas_r4_fwd_us"] = f"FAILED: {type(e).__name__}"
        for R in (4.0, 8.0):
            sf = jax.jit(functools.partial(DC.apply_dcn, params, max_offset=R))
            shift_ts[f"shift_r{int(R)}_fwd_us"] = round(
                timed(sf, [(x,) for x in xs]) * 1e6, 1)

            def shift_loss(p, x, R=R):
                return jnp.sum(DC.apply_dcn(p, x, max_offset=R) ** 2)

            sg = jax.jit(jax.value_and_grad(shift_loss))
            shift_ts[f"shift_r{int(R)}_fwdbwd_us"] = round(
                timed(sg, [(params, x) for x in xs]) * 1e6, 1)

        flops = 2 * H * W * 9 * cin * cout  # main contraction only
        row = dict(
            cin=cin, cout=cout, H=H, W=W,
            dcn_fwd_us=round(t_dcn * 1e6, 1),
            dcn_fwdbwd_us=round(t_dcn_bwd * 1e6, 1),
            conv_fwd_us=round(t_conv * 1e6, 1),
            conv_fwdbwd_us=round(t_conv_bwd * 1e6, 1),
            overhead_fwd=round(t_dcn / t_conv, 2),
            overhead_fwdbwd=round(t_dcn_bwd / t_conv_bwd, 2),
            dcn_tflops=round(flops / t_dcn / 1e12, 2),
            **shift_ts,
        )
        rows.append(row)
        print(json.dumps(row))
    tot_d = sum(r["dcn_fwdbwd_us"] for r in rows)
    tot_c = sum(r["conv_fwdbwd_us"] for r in rows)
    print(json.dumps({"total_dcn_fwdbwd_us": tot_d, "total_conv_fwdbwd_us": tot_c,
                      "overall_overhead": round(tot_d / tot_c, 2)}))


if __name__ == "__main__":
    main()
