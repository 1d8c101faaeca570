"""Bisect the mh GAT kernels' Mosaic compile crash on the real TPU.

bench_r4_gat.py: the whole-step GAT fused path dies with
`tpu_compile_helper subprocess exit code 1` (a toolchain crash, same class
as the slice-wise round kernel's).  This compiles each mh kernel (fwd and
VJP) standalone at train-like shapes, plus micro-probes for the suspect
constructs (4D refs with a static mid-axis index store/load), so the fix
targets the actual crashing pattern.

Run ONE at a time: nohup python tools/debug_gat_mh.py > logs/debug_gat_mh.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TM_CPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    from trackmpnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmpnn_tpu.ops import pallas_gat as pg

BT, NA, NT, H = 48, 24, 24, 64
G = 8


def attempt(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        first = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {first}", flush=True)
        if os.environ.get("TM_TRACE"):
            traceback.print_exc()
        return False


def inputs(nh):
    rng = np.random.default_rng(0)
    ha = jnp.asarray(rng.normal(size=(BT, NA, nh * H)).astype(np.float32))
    hn = jnp.asarray(rng.normal(size=(BT, NT, nh * H)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(nh * H, 1)).astype(np.float32))
    m3 = jnp.asarray((rng.random((BT, NA, NT)) > 0.2).astype(np.float32))
    he = jnp.asarray(rng.normal(size=(BT, NA, NT, H)).astype(np.float32))
    ka = jnp.ones((nh, BT, NA, NT), jnp.float32)
    return ha, hn, a, m3, he, ka


def main():
    print("devices:", jax.devices(), flush=True)
    for nh in (1, 3):
        ha, hn, a, m3, he, ka = inputs(nh)

        attempt(f"stats_mh nh={nh} fwd", lambda: jax.jit(
            lambda: pg.gat_scores_stats_mh(ha, hn, a, m3, 0.2, nh, G))())

        def stats_loss():
            def f(ha_, hn_, a_):
                e, rmax, cmax, sal, sbl = pg.gat_scores_stats_mh(
                    ha_, hn_, a_, m3, 0.2, nh, G)
                return (jnp.sum(e) + jnp.sum(sal) + jnp.sum(sbl))
            return jax.jit(jax.grad(f, argnums=(0, 1, 2)))(ha, hn, a)

        attempt(f"stats_mh nh={nh} vjp", stats_loss)

        e, rmax, cmax, sal, sbl = [
            jnp.asarray(np.random.default_rng(1).normal(
                size=s).astype(np.float32))
            for s in [(nh, BT, NA, NT), (nh, BT, NA), (nh, BT, NT),
                      (nh, BT, NA), (nh, BT, NT)]]
        zr = jnp.abs(sal) + 1.0
        zc = jnp.abs(sbl) + 1.0

        attempt(f"agg_mh nh={nh} fwd", lambda: jax.jit(
            lambda: pg.gat_aggregate_mh(e, rmax, cmax, zr, zc, he, m3,
                                        ka, ka, 1.0, nh, G))())

        def agg_loss():
            def f(e_, he_):
                rs, cs = pg.gat_aggregate_mh(e_, rmax, cmax, zr, zc, he_,
                                             m3, ka, ka, 1.0, nh, G)
                return jnp.sum(rs) + jnp.sum(cs)
            return jax.jit(jax.grad(f, argnums=(0, 1)))(e, he)

        attempt(f"agg_mh nh={nh} vjp", agg_loss)

    # ---- micro-probes: which construct kills the toolchain? ---------------
    nh = 3

    def probe_store4d():
        """static mid-axis index store into a 4D ref"""
        def k(x_ref, o_ref):
            for h in range(nh):
                o_ref[:, h, :, :] = x_ref[:] * (h + 1.0)
        x = jnp.ones((BT, NA, NT), jnp.float32)
        return pl.pallas_call(
            k, grid=(BT // G,),
            in_specs=[pl.BlockSpec((G, NA, NT), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, nh, NA, NT), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BT, nh, NA, NT), jnp.float32),
        )(x)

    attempt("probe store o[:, h, :, :]", probe_store4d)

    def probe_load4d():
        """static mid-axis index load from a 4D ref"""
        def k(x_ref, o_ref):
            acc = x_ref[:, 0, :, :]
            for h in range(1, nh):
                acc += x_ref[:, h, :, :]
            o_ref[:] = acc
        x = jnp.ones((BT, nh, NA, NT), jnp.float32)
        return pl.pallas_call(
            k, grid=(BT // G,),
            in_specs=[pl.BlockSpec((G, nh, NA, NT), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, NA, NT), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BT, NA, NT), jnp.float32),
        )(x)

    attempt("probe load x[:, h, :, :]", probe_load4d)

    def probe_store3d():
        """static mid-axis index store into a 3D ref"""
        def k(x_ref, o_ref):
            for h in range(nh):
                o_ref[:, h, :] = jnp.sum(x_ref[:], axis=2) * (h + 1.0)
        x = jnp.ones((BT, NA, NT), jnp.float32)
        return pl.pallas_call(
            k, grid=(BT // G,),
            in_specs=[pl.BlockSpec((G, NA, NT), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, nh, NA), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BT, nh, NA), jnp.float32),
        )(x)

    attempt("probe store o[:, h, :]", probe_store3d)

    def probe_sublane_slice_a():
        """[H,1]-shaped sublane slice of a [nh*H,1] const-spec ref"""
        def k(a_ref, x_ref, o_ref):
            for h in range(nh):
                a_h = a_ref[h * H:(h + 1) * H]
                o_ref[:, :, h * H:(h + 1) * H] = (
                    x_ref[:, :, h * H:(h + 1) * H] * a_h.reshape(1, 1, H))
        a = jnp.ones((nh * H, 1), jnp.float32)
        x = jnp.ones((BT, NA, nh * H), jnp.float32)
        return pl.pallas_call(
            k, grid=(BT // G,),
            in_specs=[pl.BlockSpec((nh * H, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((G, NA, nh * H), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, NA, nh * H), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BT, NA, nh * H), jnp.float32),
        )(a, x)

    attempt("probe a_ref[h*H:(h+1)*H] slice", probe_sublane_slice_a)

    def probe_accum4d():
        """+= accumulation into a 4D output ref (mh agg bwd's dhe path)"""
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:]
            for h in range(1, nh):
                o_ref[:] += x_ref[:] * float(h)
        x = jnp.ones((BT, NA, NT, H), jnp.float32)
        return pl.pallas_call(
            k, grid=(BT // G,),
            in_specs=[pl.BlockSpec((G, NA, NT, H), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, NA, NT, H), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BT, NA, NT, H), jnp.float32),
        )(x)

    attempt("probe 4D o_ref[:] += accumulation", probe_accum4d)


if __name__ == "__main__":
    main()
