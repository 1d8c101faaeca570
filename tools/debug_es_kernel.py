"""Bisect the es-kernel tpu_compile_helper crash (round 5).

fused_block_round_es passes Pallas lowering but crashes the Mosaic
backend (logs/bench_es_kernel2.log).  Novel constructs vs the known-good
fused_block_round, each isolated in a micro-kernel below:

  tn_dot     - dot_general contracting dim0 x dim0 (the one-hot gather)
  dyn_read   - const-input read at a program-id-derived dynamic offset
  dyn_accum  - output-ref accumulate at a dynamic offset
  onehot_mm  - iota==row one-hot build feeding a matmul
  gi_loop    - per-gi unrolled slice loop writing blocked outputs

Run on TPU, ONE at a time:
  nohup python tools/debug_es_kernel.py > logs/debug_es_kernel.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAPD, NA, H, B, G, BT = 256, 24, 64, 8, 4, 32
ND = B * CAPD


def run(tag, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{tag}: OK {jnp.asarray(out).ravel()[:3]}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return False


def k_tn_dot():
    def kern(a_ref, b_ref, o_ref):
        # [capD, na] x [capD, H] contracting dim0 -> [na, H]
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.ones((CAPD, NA), jnp.float32)
    b = jnp.ones((CAPD, H), jnp.float32)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NA, H), jnp.float32),
    ), (a, b)


def k_dyn_read():
    def kern(g_ref, o_ref):
        pid = pl.program_id(0)
        base = (pid % B) * CAPD
        o_ref[:] = jnp.sum(g_ref[pl.ds(base, CAPD)], axis=0, keepdims=True)

    g = jnp.ones((ND, H), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(BT // G,),
        in_specs=[pl.BlockSpec((ND, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT // G, H), jnp.float32),
    ), (g,)


def k_dyn_accum():
    def kern(x_ref, o_ref):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _z():
            o_ref[:] = jnp.zeros_like(o_ref)

        base = (pid % B) * CAPD
        o_ref[pl.ds(base, CAPD)] += x_ref[:]

    x = jnp.ones((CAPD, H), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(BT // G,),
        in_specs=[pl.BlockSpec((CAPD, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ND, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ND, H), jnp.float32),
    ), (x,)


def k_onehot_mm():
    def kern(idx_ref, v_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (CAPD, NA), 0).astype(
            jnp.float32)
        row = idx_ref[pl.ds(0, 1)].reshape(1, NA)
        oh = (iota == row).astype(jnp.float32)          # [capD, na]
        o_ref[:] = jnp.dot(oh, v_ref[:],
                           preferred_element_type=jnp.float32)

    idx = jnp.arange(NA, dtype=jnp.float32).reshape(1, 1, NA)
    v = jnp.ones((NA, H), jnp.float32)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CAPD, H), jnp.float32),
    ), (idx, v)


def k_gi_loop():
    def kern(x_ref, o_ref):
        for gi in range(G):
            sl = x_ref[pl.ds(gi, 1)].reshape(NA, NA)
            o_ref[pl.ds(gi, 1)] = (sl * 2.0).reshape(1, NA, NA)

    x = jnp.ones((BT, NA, NA), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(BT // G,),
        in_specs=[pl.BlockSpec((G, NA, NA), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, NA, NA), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, NA, NA), jnp.float32),
    ), (x,)


def k_combo():
    """one-hot + TN gather from a dynamic slice + dynamic accumulate —
    the es kernel's full index machinery in one tiny kernel."""
    def kern(idx_ref, g_ref, o_ref):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _z():
            o_ref[:] = jnp.zeros_like(o_ref)

        for gi in range(G):
            base = ((pid * G + gi) % B) * CAPD
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (CAPD, NA), 0).astype(jnp.float32)
            row = idx_ref[pl.ds(gi, 1)].reshape(1, NA)
            oh = (iota == row).astype(jnp.float32)
            ga = jax.lax.dot_general(
                oh, g_ref[pl.ds(base, CAPD)], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [na, H]
            o_ref[pl.ds(base, CAPD)] += jnp.dot(
                oh, ga, preferred_element_type=jnp.float32)

    idx = jnp.tile(jnp.arange(NA, dtype=jnp.float32).reshape(1, 1, NA),
                   (BT, 1, 1))
    g = jnp.ones((ND, H), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(BT // G,),
        in_specs=[pl.BlockSpec((G, 1, NA), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ND, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ND, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ND, H), jnp.float32),
    ), (idx, g)


def main():
    print("devices:", jax.devices(), flush=True)
    for tag, mk in (("tn_dot", k_tn_dot), ("dyn_read", k_dyn_read),
                    ("dyn_accum", k_dyn_accum), ("onehot_mm", k_onehot_mm),
                    ("gi_loop", k_gi_loop), ("combo", k_combo)):
        call, args = mk()
        run(tag, call, *args)


if __name__ == "__main__":
    main()
