"""Second-stage bisect of the _mh_agg_bwd_kernel Mosaic crash: nh=1 also
fails, so the head loop is not the trigger.  Stub output groups one at a
time to find the crashing computation/store.

Run ONE at a time: nohup python tools/debug_gat_mh2.py > logs/debug_gat_mh2.log 2>&1 &
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

from trackmpnn_tpu.ops.pallas_gat import _att_rect

BT, NA, NT, H = 48, 24, 24, 64
G = 8
NH = int(os.environ.get("NH", "1"))


def attempt(name, fn):
    try:
        jax.block_until_ready(fn())
        print(f"{name}: OK", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)


def run_variant(name, parts):
    """parts: subset of {'de','dm','dz','dhe'} actually computed."""
    nh = NH

    def kernel(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
               grs_ref, gcs_ref,
               de_ref, dmr_ref, dmc_ref, dzr_ref, dzc_ref, dhe_ref):
        he = he_ref[:].astype(jnp.float32)
        m3 = m_ref[:]
        grs = grs_ref[:]
        gcs = gcs_ref[:]
        datt_a = jnp.sum(grs[:, :, None, :] * he, axis=-1)
        datt_n = jnp.sum(gcs[:, None, :, :] * he, axis=-1)
        de_ref[:] = jnp.zeros_like(de_ref)
        dmr_ref[:] = jnp.zeros_like(dmr_ref)
        dmc_ref[:] = jnp.zeros_like(dmc_ref)
        dzr_ref[:] = jnp.zeros_like(dzr_ref)
        dzc_ref[:] = jnp.zeros_like(dzc_ref)
        dhe_ref[:] = jnp.zeros_like(dhe_ref)
        for h in range(nh):
            att_a, att_n = _att_rect(e_ref[:, h, :, :], mr_ref[:, h, :],
                                     mc_ref[:, h, :], zr_ref[:, h, :],
                                     zc_ref[:, h, :], m3, None, None, 1.0)
            pa = datt_a * att_a
            pn = datt_n * att_n
            if "de" in parts:
                de_ref[:, h, :, :] = pa + pn
            s_a = jnp.sum(pa, axis=2)
            s_n = jnp.sum(pn, axis=1)
            if "dm" in parts:
                dmr_ref[:, h, :] = -s_a
                dmc_ref[:, h, :] = -s_n
            if "dz" in parts:
                dzr_ref[:, h, :] = -s_a / jnp.maximum(zr_ref[:, h, :], 1e-30)
                dzc_ref[:, h, :] = -s_n / jnp.maximum(zc_ref[:, h, :], 1e-30)
            if "dhe" in parts:
                dhe = (att_a[..., None] * grs[:, :, None, :]
                       + att_n[..., None] * gcs[:, None, :, :])
                if h == 0:
                    dhe_ref[:] = dhe
                else:
                    dhe_ref[:] += dhe

    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(BT, nh, NA, NT)).astype(np.float32))
    mr = jnp.asarray(rng.normal(size=(BT, nh, NA)).astype(np.float32))
    mc = jnp.asarray(rng.normal(size=(BT, nh, NT)).astype(np.float32))
    zr = jnp.abs(mr) + 1.0
    zc = jnp.abs(mc) + 1.0
    he = jnp.asarray(rng.normal(size=(BT, NA, NT, H)).astype(np.float32))
    m3 = jnp.asarray((rng.random((BT, NA, NT)) > 0.2).astype(np.float32))
    grs = jnp.asarray(rng.normal(size=(BT, NA, H)).astype(np.float32))
    gcs = jnp.asarray(rng.normal(size=(BT, NT, H)).astype(np.float32))

    def call():
        sp = lambda s: pl.BlockSpec((G,) + s[1:],
                                    lambda i, nd=len(s): (i,) + (0,) * (nd - 1),
                                    memory_space=pltpu.VMEM)
        shapes_in = [x.shape for x in (e, mr, mc, zr, zc, he, m3, grs, gcs)]
        shapes_out = [(BT, nh, NA, NT), (BT, nh, NA), (BT, nh, NT),
                      (BT, nh, NA), (BT, nh, NT), (BT, NA, NT, H)]
        return pl.pallas_call(
            kernel, grid=(BT // G,),
            in_specs=[sp(s) for s in shapes_in],
            out_specs=tuple(sp(s) for s in shapes_out),
            out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                            for s in shapes_out),
        )(e, mr, mc, zr, zc, he, m3, grs, gcs)

    attempt(name, call)


def main():
    print("devices:", jax.devices(), "NH:", NH, flush=True)
    run_variant("none (all zeroed)", set())
    run_variant("de only", {"de"})
    run_variant("dm only", {"dm"})
    run_variant("dz only", {"dz"})
    run_variant("dhe only", {"dhe"})
    run_variant("all", {"de", "dm", "dz", "dhe"})


if __name__ == "__main__":
    main()
