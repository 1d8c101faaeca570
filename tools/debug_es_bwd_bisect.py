"""Strip-bisect the es bwd kernel's Mosaic crash: parameterized copies of
_es_bwd_kernel with individual constructs disabled.

  nohup python tools/debug_es_bwd_bisect.py > logs/debug_es_bwd_bisect.log 2>&1 &
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmpnn_tpu.ops.pallas_block import _mm, _onehot_t
from trackmpnn_tpu.ops.pallas_util import (block_specs as _specs,
                                           const_spec as _const_spec,
                                           pad_leading as _pad_bt)

BT, NA, NT, H, B, CAPD, G = 32, 24, 24, 64, 8, 256, 4
ND = B * CAPD
MMD = jnp.bfloat16


def bwd_kernel(he_ref, act_ref, new_ref, gad_ref, gbd_ref, bih_ref,
               whh_ref, whh_t_ref, bhh_ref, web_ref, m_ref,
               geo_ref, glg_ref, ges_ref,
               dhe_ref, dgad_ref, dgbd_ref, dbih_ref, dwhh_ref,
               dbhh_ref, dweb_ref, *, flags):
    sign = -1.0
    na, nt = NA, NT
    mmd = MMD
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _zero():
        dgad_ref[:] = jnp.zeros_like(dgad_ref)
        dgbd_ref[:] = jnp.zeros_like(dgbd_ref)

    acc_dwhh = acc_dbhh = acc_dbih = acc_dweb = None
    for gi in range(G):
        base = ((pid * G + gi) % B) * CAPD
        oh_a = _onehot_t(act_ref, gi, CAPD, na, mmd)
        oh_n = _onehot_t(new_ref, gi, CAPD, nt, mmd)
        if "no_gather" in flags:
            ga = gad_ref[pl.ds(0, na)].astype(jnp.float32)
            gb = gbd_ref[pl.ds(0, nt)].astype(jnp.float32)
        else:
            gad = gad_ref[pl.ds(base, CAPD)]
            gbd = gbd_ref[pl.ds(base, CAPD)]
            ga = jax.lax.dot_general(oh_a, gad.astype(mmd),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            gb = jax.lax.dot_general(oh_n, gbd.astype(mmd),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        ga = ga + bih_ref[:]
        m = m_ref[pl.ds(gi, 1)].reshape(na, nt)[..., None]
        he_m = he_ref[pl.ds(gi, 1)].reshape(na, nt, H).astype(
            jnp.float32) * m
        gh = _mm(he_m.reshape(na * nt, H), whh_ref[:], mmd).reshape(
            na, nt, 3 * H) + bhh_ref[:]
        gi_g = ga[:, None, :] + sign * gb[None, :, :]
        r = jax.nn.sigmoid(gi_g[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi_g[..., H:2 * H] + gh[..., H:2 * H])
        ghn = gh[..., 2 * H:]
        n = jnp.tanh(gi_g[..., 2 * H:] + r * ghn)

        glg = glg_ref[pl.ds(gi, 1)].reshape(na, nt)
        go = (geo_ref[pl.ds(gi, 1)].reshape(na, nt, H).astype(jnp.float32)
              + glg[..., None] * web_ref[:].reshape(1, 1, H)) * m
        eo = ((1.0 - z) * n + z * he_m) * m
        dweb = jnp.sum((eo * glg[..., None]).reshape(na * nt, H), axis=0,
                       keepdims=True)
        dz = go * (he_m - n)
        dpre_n = go * (1.0 - z) * (1.0 - n * n)
        dpre_r = dpre_n * ghn * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=-1)
        dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)

        if "no_des" in flags:
            drs = jnp.zeros((na, H), jnp.float32)
            dcs = jnp.zeros((nt, H), jnp.float32)
        else:
            des = ges_ref[pl.ds(base, CAPD)]
            drs = jax.lax.dot_general(oh_a, des.astype(mmd),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dcs = jax.lax.dot_general(oh_n, des.astype(mmd),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dhe_m = (go * z
                 + _mm(dgh.reshape(na * nt, 3 * H), whh_t_ref[:],
                       mmd).reshape(na, nt, H)
                 + drs[:, None, :] - dcs[None, :, :])
        dhe_ref[pl.ds(gi, 1)] = (dhe_m * m).reshape(
            1, na, nt, H).astype(dhe_ref.dtype)

        dga_rows = jnp.sum(dgi, axis=1)
        dgb_rows = sign * jnp.sum(dgi, axis=0)
        if "no_dyn_acc" not in flags:
            dgad_ref[pl.ds(base, CAPD)] += jnp.dot(
                oh_a, dga_rows.astype(mmd),
                preferred_element_type=jnp.float32)
            dgbd_ref[pl.ds(base, CAPD)] += jnp.dot(
                oh_n, dgb_rows.astype(mmd),
                preferred_element_type=jnp.float32)
        dbih = jnp.sum(dga_rows, axis=0, keepdims=True)
        if "no_dwhh" in flags:
            dwhh = jnp.zeros((H, 3 * H), jnp.float32)
        else:
            dwhh = _mm(he_m.reshape(na * nt, H).T,
                       dgh.reshape(na * nt, 3 * H), mmd)
        dbhh = jnp.sum(dgh, axis=(0, 1)).reshape(1, 3 * H)
        acc_dbih = dbih if acc_dbih is None else acc_dbih + dbih
        acc_dwhh = dwhh if acc_dwhh is None else acc_dwhh + dwhh
        acc_dbhh = dbhh if acc_dbhh is None else acc_dbhh + dbhh
        acc_dweb = dweb if acc_dweb is None else acc_dweb + dweb

    @pl.when(pid == 0)
    def _init_w():
        dbih_ref[:] = acc_dbih
        dwhh_ref[:] = acc_dwhh
        dbhh_ref[:] = acc_dbhh
        dweb_ref[:] = acc_dweb

    @pl.when(pid > 0)
    def _acc_w():
        dbih_ref[:] += acc_dbih
        dwhh_ref[:] += acc_dwhh
        dbhh_ref[:] += acc_dbhh
        dweb_ref[:] += acc_dweb


def build(flags):
    key = jax.random.key(0)
    he = jax.random.normal(key, (BT, NA, NT, H)).astype(jnp.bfloat16)
    act = jnp.tile(jnp.arange(NA, dtype=jnp.float32)[None, None], (BT, 1, 1))
    new = jnp.tile(jnp.arange(NT, dtype=jnp.float32)[None, None], (BT, 1, 1))
    gad = jax.random.normal(key, (ND, 3 * H)).astype(jnp.bfloat16)
    bih2 = jnp.zeros((1, 3 * H))
    whh = 0.1 * jax.random.normal(key, (H, 3 * H))
    bhh2 = jnp.zeros((1, 3 * H))
    web = 0.1 * jax.random.normal(key, (H, 1))
    m = jnp.ones((BT, NA, NT))
    geo = jax.random.normal(key, (BT, NA, NT, H)).astype(jnp.bfloat16)
    glg = jax.random.normal(key, (BT, NA, NT))
    ges = jax.random.normal(key, (ND, H))

    kernel = functools.partial(bwd_kernel, flags=flags)
    call = pl.pallas_call(
        kernel,
        grid=(BT // G,),
        in_specs=_specs([he.shape, act.shape, new.shape], G)
        + [_const_spec(gad.shape), _const_spec(gad.shape),
           _const_spec(bih2.shape), _const_spec(whh.shape),
           _const_spec(whh.T.shape), _const_spec(bhh2.shape),
           _const_spec(web.shape)]
        + _specs([m.shape, geo.shape, glg.shape], G)
        + [_const_spec(ges.shape)],
        out_specs=tuple(
            _specs([(BT, NA, NT, H)], G)
            + [_const_spec((ND, 3 * H)), _const_spec((ND, 3 * H)),
               _const_spec((1, 3 * H)), _const_spec((H, 3 * H)),
               _const_spec((1, 3 * H)), _const_spec((1, H))]),
        out_shape=(
            jax.ShapeDtypeStruct((BT, NA, NT, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((ND, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((ND, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
    )
    args = (he, act, new, gad, gad, bih2, whh, whh.T, bhh2, web, m, geo,
            glg, ges)
    return call, args


def main():
    print("devices:", jax.devices(), flush=True)
    for flags in (("no_gather", "no_des", "no_dyn_acc", "no_dwhh"),
                  ("no_des", "no_dyn_acc", "no_dwhh"),
                  ("no_dyn_acc", "no_dwhh"),
                  ("no_dwhh",),
                  ()):
        tag = "+".join(flags) or "FULL"
        call, args = build(frozenset(flags))
        try:
            out = jax.jit(call)(*args)
            jax.block_until_ready(out)
            print(f"{tag}: OK", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
