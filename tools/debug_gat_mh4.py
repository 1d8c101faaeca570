"""Third-stage bisect: surgical variants of _mh_agg_bwd_kernel at nh=1.

The head-leading relayout did NOT fix the tpu_compile_helper crash, yet
the single-head _agg_bwd_kernel (identical math) compiles.  Each variant
below changes ONE aspect to find the delta that kills the toolchain.

Run ONE at a time: nohup python tools/debug_gat_mh4.py > logs/debug_gat_mh4.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TM_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmpnn_tpu.ops.pallas_gat import _att_rect, gat_aggregate

BT, NA, NT, H = 48, 24, 24, 64
G = 8
NH = 1


def attempt(name, fn):
    try:
        jax.block_until_ready(fn())
        print(f"{name}: OK", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}", flush=True)


def data():
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(NH, BT, NA, NT)).astype(np.float32))
    mr = jnp.asarray(rng.normal(size=(NH, BT, NA)).astype(np.float32))
    mc = jnp.asarray(rng.normal(size=(NH, BT, NT)).astype(np.float32))
    zr = jnp.abs(mr) + 1.0
    zc = jnp.abs(mc) + 1.0
    he = jnp.asarray(rng.normal(size=(BT, NA, NT, H)).astype(np.float32))
    m3 = jnp.asarray((rng.random((BT, NA, NT)) > 0.2).astype(np.float32))
    grs = jnp.asarray(rng.normal(size=(BT, NA, H)).astype(np.float32))
    gcs = jnp.asarray(rng.normal(size=(BT, NT, H)).astype(np.float32))
    return e, mr, mc, zr, zc, he, m3, grs, gcs


MH = lambda s: pl.BlockSpec((s[0], G) + s[2:],
                            lambda i, nd=len(s): (0, i) + (0,) * (nd - 2),
                            memory_space=pltpu.VMEM)
SP = lambda s: pl.BlockSpec((G,) + s[1:],
                            lambda i, nd=len(s): (i,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)


def call_variant(kernel, outs):
    e, mr, mc, zr, zc, he, m3, grs, gcs = data()
    ins = (e, mr, mc, zr, zc, he, m3, grs, gcs)
    in_specs = [MH(e.shape), MH(mr.shape), MH(mc.shape), MH(zr.shape),
                MH(zc.shape), SP(he.shape), SP(m3.shape), SP(grs.shape),
                SP(gcs.shape)]
    out_specs = tuple(MH(s) if len(s) and s[0] == NH and s != he.shape
                      else SP(s) for s in outs)
    out_shape = tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in outs)
    return pl.pallas_call(kernel, grid=(BT // G,), in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape)(*ins)


def common(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
           grs_ref, gcs_ref, use_dot):
    he = he_ref[:].astype(jnp.float32)
    m3 = m_ref[:]
    grs = grs_ref[:]
    gcs = gcs_ref[:]
    if use_dot:
        # contract over H with (G, na)/(G, nt) batch dims on the MXU
        datt_a = jax.lax.dot_general(
            he, grs, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        dn = jax.lax.dot_general(
            jnp.swapaxes(he, 1, 2), gcs, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)           # [G, nt, na]
        datt_n = jnp.swapaxes(dn, 1, 2)
    else:
        datt_a = jnp.sum(grs[:, :, None, :] * he, axis=-1)
        datt_n = jnp.sum(gcs[:, None, :, :] * he, axis=-1)
    att_a, att_n = _att_rect(e_ref[0], mr_ref[0], mc_ref[0], zr_ref[0],
                             zc_ref[0], m3, None, None, 1.0)
    return att_a, att_n, datt_a, datt_n, he, grs, gcs


def main():
    print("devices:", jax.devices(), flush=True)
    e, mr, mc, zr, zc, he, m3, grs, gcs = data()

    def v0():
        def f(e_, he_):
            rs, cs = gat_aggregate(e_[0], mr[0], mc[0], zr[0], zc[0], he_,
                                   m3, m3, m3, 1.0, G)
            return jnp.sum(rs) + jnp.sum(cs)
        return jax.jit(jax.grad(f, argnums=(0, 1)))(e, he)

    attempt("V0 single-head control", v0)

    def k_full(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
               grs_ref, gcs_ref, de_ref, dmr_ref, dmc_ref, dzr_ref,
               dzc_ref, dhe_ref, *, use_dot):
        att_a, att_n, datt_a, datt_n, he, grs, gcs = common(
            e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
            grs_ref, gcs_ref, use_dot)
        pa = datt_a * att_a
        pn = datt_n * att_n
        de_ref[0] = pa + pn
        s_a = jnp.sum(pa, axis=2)
        s_n = jnp.sum(pn, axis=1)
        dmr_ref[0] = -s_a
        dmc_ref[0] = -s_n
        dzr_ref[0] = -s_a / jnp.maximum(zr_ref[0], 1e-30)
        dzc_ref[0] = -s_n / jnp.maximum(zc_ref[0], 1e-30)
        dhe_ref[:] = (att_a[..., None] * grs[:, :, None, :]
                      + att_n[..., None] * gcs[:, None, :, :])

    outs6 = [(NH, BT, NA, NT), (NH, BT, NA), (NH, BT, NT), (NH, BT, NA),
             (NH, BT, NT), (BT, NA, NT, H)]
    attempt("V1 mh kernel as-is", lambda: call_variant(
        functools.partial(k_full, use_dot=False), outs6))
    attempt("V2 datt via dot_general", lambda: call_variant(
        functools.partial(k_full, use_dot=True), outs6))

    def k_nodz(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
               grs_ref, gcs_ref, de_ref, dhe_ref):
        att_a, att_n, datt_a, datt_n, he, grs, gcs = common(
            e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
            grs_ref, gcs_ref, False)
        pa = datt_a * att_a
        pn = datt_n * att_n
        de_ref[0] = pa + pn
        dhe_ref[:] = (att_a[..., None] * grs[:, :, None, :]
                      + att_n[..., None] * gcs[:, None, :, :])

    attempt("V3 de+dhe only", lambda: call_variant(
        k_nodz, [(NH, BT, NA, NT), (BT, NA, NT, H)]))

    def k_flatout(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
                  grs_ref, gcs_ref, de_ref, dmr_ref, dmc_ref, dzr_ref,
                  dzc_ref, dhe_ref):
        att_a, att_n, datt_a, datt_n, he, grs, gcs = common(
            e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
            grs_ref, gcs_ref, False)
        pa = datt_a * att_a
        pn = datt_n * att_n
        de_ref[:] = pa + pn
        s_a = jnp.sum(pa, axis=2)
        s_n = jnp.sum(pn, axis=1)
        dmr_ref[:] = -s_a
        dmc_ref[:] = -s_n
        dzr_ref[:] = -s_a / jnp.maximum(zr_ref[0], 1e-30)
        dzc_ref[:] = -s_n / jnp.maximum(zc_ref[0], 1e-30)
        dhe_ref[:] = (att_a[..., None] * grs[:, :, None, :]
                      + att_n[..., None] * gcs[:, None, :, :])

    attempt("V4 unstacked outputs (mh loads)", lambda: call_variant(
        k_flatout, [(BT, NA, NT), (BT, NA), (BT, NT), (BT, NA), (BT, NT),
                    (BT, NA, NT, H)]))

    def k_flatin(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
                 grs_ref, gcs_ref, de_ref, dmr_ref, dmc_ref, dzr_ref,
                 dzc_ref, dhe_ref):
        # mh-stacked OUTPUT stores, single-head loads: e_ref etc. are fed
        # pre-squeezed by the wrapper below
        he = he_ref[:].astype(jnp.float32)
        m3 = m_ref[:]
        grs = grs_ref[:]
        gcs = gcs_ref[:]
        datt_a = jnp.sum(grs[:, :, None, :] * he, axis=-1)
        datt_n = jnp.sum(gcs[:, None, :, :] * he, axis=-1)
        att_a, att_n = _att_rect(e_ref[:], mr_ref[:], mc_ref[:], zr_ref[:],
                                 zc_ref[:], m3, None, None, 1.0)
        pa = datt_a * att_a
        pn = datt_n * att_n
        de_ref[0] = pa + pn
        s_a = jnp.sum(pa, axis=2)
        s_n = jnp.sum(pn, axis=1)
        dmr_ref[0] = -s_a
        dmc_ref[0] = -s_n
        dzr_ref[0] = -s_a / jnp.maximum(zr_ref[:], 1e-30)
        dzc_ref[0] = -s_n / jnp.maximum(zc_ref[:], 1e-30)
        dhe_ref[:] = (att_a[..., None] * grs[:, :, None, :]
                      + att_n[..., None] * gcs[:, None, :, :])

    def call_flatin():
        ins = (e[0], mr[0], mc[0], zr[0], zc[0], he, m3, grs, gcs)
        in_specs = [SP(x.shape) for x in ins]
        out_specs = tuple([MH(s) for s in outs6[:5]] + [SP(outs6[5])])
        out_shape = tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                          for s in outs6)
        return pl.pallas_call(k_flatin, grid=(BT // G,), in_specs=in_specs,
                              out_specs=out_specs, out_shape=out_shape)(*ins)

    attempt("V5 stacked outputs (flat loads)", call_flatin)


if __name__ == "__main__":
    main()
