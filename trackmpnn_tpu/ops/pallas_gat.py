"""Fused Pallas kernel for the GAT attention scores.

The XLA GAT support (train/block.py::_block_gat_support) materializes the
H-wide rectangle a_in = |h_att[act_i] - h_att[new_j]| per head per step
just to contract it to a scalar score - the same HBM-trip shape the fused
round eliminated for the GRU.  This kernel forms |diff| in VMEM and emits
only the [BT, na, nt] scores:

    e[i, j] = leaky_relu( sum_h |ha[i, h] - hn[j, h]| * a[h] ) * mask

with a custom VJP that recomputes |diff| (inputs-only residuals) and
returns d ha, d hn and the grid-accumulated d a.  Masked entries are 0 in
both value and cotangent flow, matching the row layout's pre-masked a_in
(mpnn._gat_head, ref layers.py:7-46).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmpnn_tpu.ops.pallas_util import (
    block_specs as _specs,
    const_spec as _const_spec,
    pad_leading as _pad_bt,
)

# grid blocks per launch for the stacked-head kernels; TM_GAT_G overrides
# (the 3-head fused path fails to COMPILE at some (G, K) points on this
# toolchain — the knob lets per-config selection find a compiling grid)
DEFAULT_G = int(os.environ.get("TM_GAT_G", "8"))


def _fwd_kernel(ha_ref, hn_ref, a_ref, m_ref, e_ref, *, alpha):
    G, na, H = ha_ref.shape
    nt = hn_ref.shape[1]
    diff = jnp.abs(ha_ref[:][:, :, None, :] - hn_ref[:][:, None, :, :])
    pre = jnp.dot(diff.reshape(G * na * nt, H), a_ref[:],
                  preferred_element_type=jnp.float32).reshape(G, na, nt)
    pre = pre * m_ref[:]
    e_ref[:] = jnp.where(pre >= 0.0, pre, alpha * pre)


def _bwd_kernel(ha_ref, hn_ref, a_ref, m_ref, ge_ref,
                dha_ref, dhn_ref, da_ref, *, alpha):
    G, na, H = ha_ref.shape
    nt = hn_ref.shape[1]
    d = ha_ref[:][:, :, None, :] - hn_ref[:][:, None, :, :]
    adiff = jnp.abs(d)
    pre = jnp.dot(adiff.reshape(G * na * nt, H), a_ref[:],
                  preferred_element_type=jnp.float32).reshape(G, na, nt)
    m3 = m_ref[:]
    pre_m = pre * m3
    dpre = ge_ref[:] * jnp.where(pre_m >= 0.0, 1.0, alpha) * m3
    # d|x| = sign(x); lax.sign(0) = 0 matches autodiff's subgradient
    t = dpre[..., None] * jnp.sign(d) * a_ref[:].reshape(1, 1, 1, H)
    dha_ref[:] = jnp.sum(t, axis=2)
    dhn_ref[:] = -jnp.sum(t, axis=1)
    prod = adiff * dpre[..., None]
    da = jnp.sum(prod.reshape(G * na * nt, H), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        da_ref[:] = da

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        da_ref[:] += da


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gat_scores(ha, hn, a, mask3, alpha, g=DEFAULT_G, interpret=False):
    """leaky_relu(|ha_i - hn_j| @ a) * mask, never materializing |diff|.

    ha f32 [BT,na,H]; hn f32 [BT,nt,H]; a f32 [H,1]; mask3 f32 [BT,na,nt]
    0/1; alpha static leaky-relu slope.  Returns f32 [BT,na,nt].
    """
    out, _ = _fwd(ha, hn, a, mask3, alpha, g, interpret)
    return out


def _fwd(ha, hn, a, mask3, alpha, g, interpret):
    BT, na, H = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p = (_pad_bt(x, bt_pad) for x in (ha, hn, mask3))
    kernel = functools.partial(_fwd_kernel, alpha=alpha)
    (e,) = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)] + _specs([m_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, nt)], g)),
        out_shape=(jax.ShapeDtypeStruct((bt_pad, na, nt), jnp.float32),),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p)
    return e[:BT], (ha, hn, a, mask3)


def _bwd(alpha, g, interpret, res, ge):
    ha, hn, a, mask3 = res
    BT, na, H = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p, ge_p = (_pad_bt(x, bt_pad)
                             for x in (ha, hn, mask3, ge))
    kernel = functools.partial(_bwd_kernel, alpha=alpha)
    dha, dhn, da = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)] + _specs([m_p.shape, ge_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, H), (bt_pad, nt, H)], g)
                        + [_const_spec((1, H))]),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, H), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p, ge_p)
    return dha[:BT], dhn[:BT], da.T, jnp.zeros_like(mask3)


gat_scores.defvjp(_fwd, _bwd)


def reference_gat_scores(ha, hn, a, mask3, alpha):
    """Plain-XLA oracle (the formulation _block_gat_support used)."""
    a_in = jnp.abs(ha[:, :, None, :] - hn[:, None, :, :])
    pre = (a_in @ a)[..., 0] * mask3
    return jnp.where(pre >= 0.0, pre, np.float32(alpha) * pre)


# --------------------------------------------------------------------------
# Round-3 extension: the full attention chain in VMEM.
#
# The score kernel above still left softmax + aggregation to XLA, which
# materializes ~5 score-sized rectangles per head per step AND stacks them
# as scan residuals (remat=True re-runs the whole chain instead and
# measured worse: logs/bench_gat_remat.log).  Two further kernels remove
# all of it:
#
#   gat_scores_stats: scores e PLUS block-local row/col max and local
#     exp-sums (two-pass logsumexp decomposition) — the global softmax
#     normalizer is then assembled from [BT, na]-sized pieces in XLA
#     (sa = exp(rmax - m) * sa_l), no rectangle pass.
#   gat_aggregate: att = exp(e - m)/z (x dropout) contracted with the edge
#     hiddens to rs/cs, never materializing the attention rectangles; the
#     VJP recomputes att from inputs (inputs-only residuals, nothing
#     stacked by the scan).
#
# The max path (rmax/cmax -> segment_max -> m) is stop-gradient'd by the
# caller, as in jax.nn.softmax: softmax values/grads are independent of
# the shift, so routing cotangents through argmax is pure waste.  Both
# kernels still emit EXACT partials for every input so unit tests can
# check them against XLA autodiff.
NEG_SCORE = np.float32(-1e30)


def _stats_fwd_kernel(ha_ref, hn_ref, a_ref, m_ref,
                      e_ref, rmax_ref, cmax_ref, sal_ref, sbl_ref, *, alpha):
    G, na, H = ha_ref.shape
    nt = hn_ref.shape[1]
    diff = jnp.abs(ha_ref[:][:, :, None, :] - hn_ref[:][:, None, :, :])
    pre = jnp.dot(diff.reshape(G * na * nt, H), a_ref[:],
                  preferred_element_type=jnp.float32).reshape(G, na, nt)
    m3 = m_ref[:]
    pre = pre * m3
    e = jnp.where(pre >= 0.0, pre, alpha * pre)
    e_ref[:] = e
    e_m = jnp.where(m3 > 0.0, e, NEG_SCORE)
    rmax = jnp.max(e_m, axis=2)
    cmax = jnp.max(e_m, axis=1)
    rmax_ref[:] = rmax
    cmax_ref[:] = cmax
    sal_ref[:] = jnp.sum(m3 * jnp.exp(e_m - rmax[:, :, None]), axis=2)
    sbl_ref[:] = jnp.sum(m3 * jnp.exp(e_m - cmax[:, None, :]), axis=1)


def _stats_bwd_kernel(ha_ref, hn_ref, a_ref, m_ref, ge_ref, gsal_ref,
                      gsbl_ref, dha_ref, dhn_ref, da_ref, *, alpha):
    G, na, H = ha_ref.shape
    nt = hn_ref.shape[1]
    d = ha_ref[:][:, :, None, :] - hn_ref[:][:, None, :, :]
    adiff = jnp.abs(d)
    pre = jnp.dot(adiff.reshape(G * na * nt, H), a_ref[:],
                  preferred_element_type=jnp.float32).reshape(G, na, nt)
    m3 = m_ref[:]
    pre_m = pre * m3
    e = jnp.where(pre_m >= 0.0, pre_m, alpha * pre_m)
    e_m = jnp.where(m3 > 0.0, e, NEG_SCORE)
    rmax = jnp.max(e_m, axis=2)
    cmax = jnp.max(e_m, axis=1)
    # d sa_l / d e = m3 * exp(e - rmax) with rmax constant (the rmax terms
    # of the true total derivative cancel against the exp(rmax - m) factor
    # assembled outside; see jax.nn.softmax's stop_gradient convention)
    de = (ge_ref[:]
          + gsal_ref[:][:, :, None] * m3 * jnp.exp(e_m - rmax[:, :, None])
          + gsbl_ref[:][:, None, :] * m3 * jnp.exp(e_m - cmax[:, None, :]))
    dpre = de * jnp.where(pre_m >= 0.0, 1.0, alpha) * m3
    t = dpre[..., None] * jnp.sign(d) * a_ref[:].reshape(1, 1, 1, H)
    dha_ref[:] = jnp.sum(t, axis=2)
    dhn_ref[:] = -jnp.sum(t, axis=1)
    da = jnp.sum((adiff * dpre[..., None]).reshape(G * na * nt, H), axis=0,
                 keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        da_ref[:] = da

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        da_ref[:] += da


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gat_scores_stats(ha, hn, a, mask3, alpha, g=DEFAULT_G, interpret=False):
    """(e, rmax, cmax, sa_l, sb_l) for one attention head.

    e f32 [BT,na,nt] masked leaky-relu scores (== gat_scores); rmax/cmax
    f32 [BT,na]/[BT,nt] row/col maxes over live entries (NEG_SCORE where a
    row/col is fully masked); sa_l/sb_l the matching local exp-sums
    sum m3*exp(e - max).  The caller assembles the global softmax pieces
    sa = exp(rmax - m) * sa_l on detection-sized arrays.  rmax/cmax carry
    no gradient (shift invariance) — stop_gradient them downstream.
    """
    out, _ = _stats_fwd(ha, hn, a, mask3, alpha, g, interpret)
    return out


def _stats_fwd(ha, hn, a, mask3, alpha, g, interpret):
    BT, na, H = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p = (_pad_bt(x, bt_pad) for x in (ha, hn, mask3))
    kernel = functools.partial(_stats_fwd_kernel, alpha=alpha)
    e, rmax, cmax, sal, sbl = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)] + _specs([m_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, nt), (bt_pad, na), (bt_pad, nt),
                                (bt_pad, na), (bt_pad, nt)], g)),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, nt), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt), jnp.float32),
        ),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p)
    out = (e[:BT], rmax[:BT], cmax[:BT], sal[:BT], sbl[:BT])
    return out, (ha, hn, a, mask3)


def _stats_bwd(alpha, g, interpret, res, grads):
    ha, hn, a, mask3 = res
    ge, _grmax, _gcmax, gsal, gsbl = grads  # rmax/cmax are stop-grad'd
    BT, na, H = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p, ge_p, gsal_p, gsbl_p = (
        _pad_bt(x, bt_pad) for x in (ha, hn, mask3, ge, gsal, gsbl))
    kernel = functools.partial(_stats_bwd_kernel, alpha=alpha)
    dha, dhn, da = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)]
        + _specs([m_p.shape, ge_p.shape, gsal_p.shape, gsbl_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, H), (bt_pad, nt, H)], g)
                        + [_const_spec((1, H))]),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, H), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p, ge_p, gsal_p, gsbl_p)
    return dha[:BT], dhn[:BT], da.T, jnp.zeros_like(mask3)


gat_scores_stats.defvjp(_stats_fwd, _stats_bwd)


def _att_rect(e, mr, mc, zr, zc, m3, ka, kn, keep):
    """Recomputable attention rectangles (f32, inside kernels)."""
    att_a = m3 * jnp.exp(e - mr[:, :, None]) \
        / jnp.maximum(zr[:, :, None], 1e-30)
    att_n = m3 * jnp.exp(e - mc[:, None, :]) \
        / jnp.maximum(zc[:, None, :], 1e-30)
    if keep < 1.0:
        att_a = att_a * ka / keep
        att_n = att_n * kn / keep
    return att_a, att_n


def _agg_fwd_kernel(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
                    ka_ref, kn_ref, rs_ref, cs_ref, *, keep):
    att_a, att_n = _att_rect(e_ref[:], mr_ref[:], mc_ref[:], zr_ref[:],
                             zc_ref[:], m_ref[:],
                             ka_ref[:] if keep < 1.0 else None,
                             kn_ref[:] if keep < 1.0 else None, keep)
    he = he_ref[:].astype(jnp.float32)
    rs_ref[:] = jnp.sum(att_a[..., None] * he, axis=2)
    cs_ref[:] = jnp.sum(att_n[..., None] * he, axis=1)


def _agg_bwd_kernel(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, da_ref, dn_ref,
                    m_ref, ka_ref, kn_ref, grs_ref, gcs_ref,
                    de_ref, dmr_ref, dmc_ref, dzr_ref, dzc_ref, dhe_ref,
                    *, keep):
    # datt_a/datt_n (the <grad, h_e> contractions over H) arrive
    # PRECOMPUTED by XLA einsums: reducing the LANE axis of the 4D
    # product in-kernel crashes this toolchain's tpu_compile_helper
    # (bisected in tools/debug_gat_mh*.py — every variant that kept the
    # in-kernel jnp.sum(... * he, axis=-1) died, the datt-free dhe path
    # compiled), and Mosaic rejects batched dot_general outright.  XLA
    # runs the contraction on the MXU anyway; the kernel then no longer
    # reads h_e at all.
    att_a, att_n = _att_rect(e_ref[:], mr_ref[:], mc_ref[:], zr_ref[:],
                             zc_ref[:], m_ref[:],
                             ka_ref[:] if keep < 1.0 else None,
                             kn_ref[:] if keep < 1.0 else None, keep)
    grs = grs_ref[:]
    gcs = gcs_ref[:]
    pa = da_ref[:] * att_a
    pn = dn_ref[:] * att_n
    de_ref[:] = pa + pn
    s_a = jnp.sum(pa, axis=2)                            # [G, na]
    s_n = jnp.sum(pn, axis=1)                            # [G, nt]
    dmr_ref[:] = -s_a
    dmc_ref[:] = -s_n
    dzr_ref[:] = -s_a / jnp.maximum(zr_ref[:], 1e-30)
    dzc_ref[:] = -s_n / jnp.maximum(zc_ref[:], 1e-30)
    dhe = (att_a[..., None] * grs[:, :, None, :]
           + att_n[..., None] * gcs[:, None, :, :])
    dhe_ref[:] = dhe.astype(dhe_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def gat_aggregate(e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn,
                  keep, g=DEFAULT_G, interpret=False):
    """(rs, cs) = attention-weighted row/col sums of the edge hiddens.

        att_a = m3 * exp(e - m_row) / z_row * ka / keep     [BT, na, nt]
        att_n = m3 * exp(e - m_col) / z_col * kn / keep
        rs    = sum_j att_a * h_e                            [BT, na, H]
        cs    = sum_i att_n * h_e                            [BT, nt, H]

    never materializing att_a/att_n in HBM (fwd or bwd; the VJP recomputes
    them from inputs, so the scan stacks nothing rectangle-sized).  e f32
    [BT,na,nt]; m_row/z_row f32 [BT,na]; m_col/z_col f32 [BT,nt]; h_e
    f32/bf16 [BT,na,nt,H]; mask3 f32 0/1; ka/kn f32 0/1 dropout keep masks
    (pass mask3 and keep=1.0 when not training — they are ignored).  The
    VJP emits exact partials for every differentiable input (d m_row =
    -sum_j datt*att etc.); the caller should still stop_gradient the max
    path, which makes those zero-sum round trips dead code.
    """
    out, _ = _agg_fwd(e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn,
                      keep, g, interpret)
    return out


def _agg_fwd(e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn, keep, g,
             interpret):
    BT, na, nt, H = h_e.shape
    bt_pad = -(-BT // g) * g
    pads = (_pad_bt(x, bt_pad)
            for x in (e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn))
    e_p, mr_p, mc_p, zr_p, zc_p, he_p, m_p, ka_p, kn_p = pads
    kernel = functools.partial(_agg_fwd_kernel, keep=keep)
    rs, cs = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([e_p.shape, mr_p.shape, mc_p.shape, zr_p.shape,
                         zc_p.shape, he_p.shape, m_p.shape, ka_p.shape,
                         kn_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, H), (bt_pad, nt, H)], g)),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, H), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt, H), jnp.float32),
        ),
        interpret=interpret,
    )(e_p, mr_p, mc_p, zr_p, zc_p, he_p, m_p, ka_p, kn_p)
    return (rs[:BT], cs[:BT]), (e, m_row, m_col, z_row, z_col, h_e, mask3,
                                ka, kn)


def _datt(h_e, g_rs, g_cs):
    """<grad, h_e> contractions over H, in XLA (see _agg_bwd_kernel)."""
    he32 = h_e.astype(jnp.float32)
    datt_a = jnp.einsum("bijh,bih->bij", he32, g_rs,
                        preferred_element_type=jnp.float32)
    datt_n = jnp.einsum("bijh,bjh->bij", he32, g_cs,
                        preferred_element_type=jnp.float32)
    return datt_a, datt_n


def _agg_bwd(keep, g, interpret, res, grads):
    e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn = res
    g_rs, g_cs = grads
    BT, na, nt, H = h_e.shape
    bt_pad = -(-BT // g) * g
    datt_a, datt_n = _datt(h_e, g_rs, g_cs)
    pads = (_pad_bt(x, bt_pad)
            for x in (e, m_row, m_col, z_row, z_col, datt_a, datt_n,
                      mask3, ka, kn, g_rs, g_cs))
    e_p, mr_p, mc_p, zr_p, zc_p, da_p, dn_p, m_p, ka_p, kn_p, grs_p, \
        gcs_p = pads
    kernel = functools.partial(_agg_bwd_kernel, keep=keep)
    de, dmr, dmc, dzr, dzc, dhe = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([e_p.shape, mr_p.shape, mc_p.shape, zr_p.shape,
                         zc_p.shape, da_p.shape, dn_p.shape, m_p.shape,
                         ka_p.shape, kn_p.shape, grs_p.shape,
                         gcs_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, nt), (bt_pad, na),
                                (bt_pad, nt), (bt_pad, na), (bt_pad, nt),
                                (bt_pad, na, nt, H)], g)),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, nt), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, na, nt, H), h_e.dtype),
        ),
        interpret=interpret,
    )(e_p, mr_p, mc_p, zr_p, zc_p, da_p, dn_p, m_p, ka_p, kn_p, grs_p,
      gcs_p)
    return (de[:BT], dmr[:BT], dmc[:BT], dzr[:BT], dzc[:BT], dhe[:BT],
            jnp.zeros_like(mask3), jnp.zeros_like(ka), jnp.zeros_like(kn))


gat_aggregate.defvjp(_agg_fwd, _agg_bwd)


def reference_gat_aggregate(e, m_row, m_col, z_row, z_col, h_e, mask3, ka,
                            kn, keep):
    """Plain-XLA oracle for gat_aggregate (parity tests)."""
    att_a, att_n = _att_rect(e, m_row, m_col, z_row, z_col, mask3,
                             ka, kn, keep)
    he = h_e.astype(jnp.float32)
    return (jnp.sum(att_a[..., None] * he, axis=2),
            jnp.sum(att_n[..., None] * he, axis=1))


# --------------------------------------------------------------------------
# Round-4 extension: ALL heads in one launch.
#
# The per-head Python loop in train/block.py cost 2 kernel launches per
# head per step (scores_stats + aggregate, each ~0.2 ms of fixed launch/
# grid overhead on this toolchain) plus per-head gathers and segment ops.
# The _mh kernels stack the heads inside one grid pass:
#
#   * ha/hn arrive with the heads CONCATENATED on the feature dim
#     [BT, na, nh*H] (one detection-layout matmul + one gather for all
#     heads); scores/stats come back stacked on the LEADING axis
#     [nh, BT, na, nt];
#   * the aggregate kernel emits rs/cs already SUMMED over heads (the
#     caller divides by nh) - the downstream segment_sum runs once, not
#     per head - while the softmax stats keep their per-head identity
#     ([nh, BT, ...]) because the normalizers differ per head.
#
# The head axis MUST be the leading (untiled) one.  Stacking it mid-array
# ([BT, nh, na, nt]) and storing attention-derived values through
# `ref[:, h, ...]` crashes this toolchain's tpu_compile_helper (bisected
# in tools/debug_gat_mh*.py: every mid-axis store of an att-chain value
# dies; the same value stored to an unstacked ref compiles, and so do
# isolated mid-axis store probes).  Leading-axis indexing `ref[h]` is a
# plain block offset on the (second-minor, minor)-tiled layout and
# compiles everywhere.
#
# Dropout keep-masks arrive as [nh(or 1), BT, na, nt]; a size-1 head axis
# broadcasts inside the kernel (used for the keep=1.0 eval path, where the
# mask is ignored numerically but shapes must still bind).
def _mh_specs(shapes, g):
    """BlockSpecs for head-leading [nh, BT, ...] arrays: full head axis,
    dim-1 sliced in chunks of g blocks."""
    return [
        pl.BlockSpec((s[0], g) + s[2:],
                     lambda i, nd=len(s): (0, i) + (0,) * (nd - 2),
                     memory_space=pltpu.VMEM)
        for s in shapes
    ]


def _pad_axis1(x, n):
    if x.shape[1] == n:
        return x
    pad = [(0, 0), (0, n - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad)


def _mh_stats_fwd_kernel(ha_ref, hn_ref, a_ref, m_ref,
                         e_ref, rmax_ref, cmax_ref, sal_ref, sbl_ref,
                         *, alpha, nh):
    G, na, HH = ha_ref.shape
    H = HH // nh
    nt = hn_ref.shape[1]
    m3 = m_ref[:]
    for h in range(nh):
        ha = ha_ref[:, :, h * H:(h + 1) * H]
        hn = hn_ref[:, :, h * H:(h + 1) * H]
        diff = jnp.abs(ha[:, :, None, :] - hn[:, None, :, :])
        pre = jnp.dot(diff.reshape(G * na * nt, H),
                      a_ref[h * H:(h + 1) * H],
                      preferred_element_type=jnp.float32).reshape(G, na, nt)
        pre = pre * m3
        e = jnp.where(pre >= 0.0, pre, alpha * pre)
        e_ref[h] = e
        e_m = jnp.where(m3 > 0.0, e, NEG_SCORE)
        rmax = jnp.max(e_m, axis=2)
        cmax = jnp.max(e_m, axis=1)
        rmax_ref[h] = rmax
        cmax_ref[h] = cmax
        sal_ref[h] = jnp.sum(m3 * jnp.exp(e_m - rmax[:, :, None]), axis=2)
        sbl_ref[h] = jnp.sum(m3 * jnp.exp(e_m - cmax[:, None, :]), axis=1)


def _mh_stats_bwd_kernel(ha_ref, hn_ref, a_ref, m_ref, ge_ref, gsal_ref,
                         gsbl_ref, dha_ref, dhn_ref, da_ref, *, alpha, nh):
    G, na, HH = ha_ref.shape
    H = HH // nh
    nt = hn_ref.shape[1]
    m3 = m_ref[:]
    for h in range(nh):
        ha = ha_ref[:, :, h * H:(h + 1) * H]
        hn = hn_ref[:, :, h * H:(h + 1) * H]
        a_h = a_ref[h * H:(h + 1) * H]
        d = ha[:, :, None, :] - hn[:, None, :, :]
        adiff = jnp.abs(d)
        pre = jnp.dot(adiff.reshape(G * na * nt, H), a_h,
                      preferred_element_type=jnp.float32).reshape(G, na, nt)
        pre_m = pre * m3
        e = jnp.where(pre_m >= 0.0, pre_m, alpha * pre_m)
        e_m = jnp.where(m3 > 0.0, e, NEG_SCORE)
        rmax = jnp.max(e_m, axis=2)
        cmax = jnp.max(e_m, axis=1)
        de = (ge_ref[h]
              + gsal_ref[h][:, :, None] * m3
              * jnp.exp(e_m - rmax[:, :, None])
              + gsbl_ref[h][:, None, :] * m3
              * jnp.exp(e_m - cmax[:, None, :]))
        dpre = de * jnp.where(pre_m >= 0.0, 1.0, alpha) * m3
        t = dpre[..., None] * jnp.sign(d) * a_h.reshape(1, 1, 1, H)
        dha_ref[:, :, h * H:(h + 1) * H] = jnp.sum(t, axis=2)
        dhn_ref[:, :, h * H:(h + 1) * H] = -jnp.sum(t, axis=1)
        da = jnp.sum((adiff * dpre[..., None]).reshape(G * na * nt, H),
                     axis=0, keepdims=True)

        @pl.when(pl.program_id(0) == 0)
        def _init(h=h, da=da):
            da_ref[:, h * H:(h + 1) * H] = da

        @pl.when(pl.program_id(0) > 0)
        def _acc(h=h, da=da):
            da_ref[:, h * H:(h + 1) * H] += da


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def gat_scores_stats_mh(ha, hn, a, mask3, alpha, nh, g=DEFAULT_G,
                        interpret=False):
    """Stacked-head (e, rmax, cmax, sa_l, sb_l) in ONE kernel launch.

    ha f32 [BT,na,nh*H] / hn f32 [BT,nt,nh*H] with heads concatenated on
    the feature dim; a f32 [nh*H,1] stacked per-head score vectors; mask3
    f32 [BT,na,nt].  Returns e [nh,BT,na,nt], rmax/sa_l [nh,BT,na],
    cmax/sb_l [nh,BT,nt] (head-LEADING, see module comment) - per-head
    semantics identical to gat_scores_stats (rmax/cmax are shift
    constants: stop_gradient them).
    """
    out, _ = _mh_stats_fwd(ha, hn, a, mask3, alpha, nh, g, interpret)
    return out


def _mh_stats_fwd(ha, hn, a, mask3, alpha, nh, g, interpret):
    BT, na, HH = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p = (_pad_bt(x, bt_pad) for x in (ha, hn, mask3))
    kernel = functools.partial(_mh_stats_fwd_kernel, alpha=alpha, nh=nh)
    e, rmax, cmax, sal, sbl = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)] + _specs([m_p.shape], g),
        out_specs=tuple(_mh_specs([(nh, bt_pad, na, nt), (nh, bt_pad, na),
                                   (nh, bt_pad, nt), (nh, bt_pad, na),
                                   (nh, bt_pad, nt)], g)),
        out_shape=(
            jax.ShapeDtypeStruct((nh, bt_pad, na, nt), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, nt), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, nt), jnp.float32),
        ),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p)
    out = (e[:, :BT], rmax[:, :BT], cmax[:, :BT], sal[:, :BT], sbl[:, :BT])
    return out, (ha, hn, a, mask3)


def _mh_stats_bwd(alpha, nh, g, interpret, res, grads):
    ha, hn, a, mask3 = res
    ge, _grmax, _gcmax, gsal, gsbl = grads
    BT, na, HH = ha.shape
    nt = hn.shape[1]
    bt_pad = -(-BT // g) * g
    ha_p, hn_p, m_p = (_pad_bt(x, bt_pad) for x in (ha, hn, mask3))
    ge_p, gsal_p, gsbl_p = (_pad_axis1(x, bt_pad) for x in (ge, gsal, gsbl))
    kernel = functools.partial(_mh_stats_bwd_kernel, alpha=alpha, nh=nh)
    dha, dhn, da = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([ha_p.shape, hn_p.shape], g)
        + [_const_spec(a.shape)] + _specs([m_p.shape], g)
        + _mh_specs([ge_p.shape, gsal_p.shape, gsbl_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, HH), (bt_pad, nt, HH)], g)
                        + [_const_spec((1, HH))]),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, HH), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt, HH), jnp.float32),
            jax.ShapeDtypeStruct((1, HH), jnp.float32),
        ),
        interpret=interpret,
    )(ha_p, hn_p, a, m_p, ge_p, gsal_p, gsbl_p)
    return dha[:BT], dhn[:BT], da.T, jnp.zeros_like(mask3)


gat_scores_stats_mh.defvjp(_mh_stats_fwd, _mh_stats_bwd)


def _mh_agg_fwd_kernel(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, he_ref, m_ref,
                       ka_ref, kn_ref, rs_ref, cs_ref, *, keep, nh):
    he = he_ref[:].astype(jnp.float32)
    m3 = m_ref[:]
    ka_nh = ka_ref.shape[0]
    for h in range(nh):
        ka = ka_ref[h if ka_nh > 1 else 0] if keep < 1.0 else None
        kn = kn_ref[h if ka_nh > 1 else 0] if keep < 1.0 else None
        att_a, att_n = _att_rect(e_ref[h], mr_ref[h], mc_ref[h], zr_ref[h],
                                 zc_ref[h], m3, ka, kn, keep)
        rs = jnp.sum(att_a[..., None] * he, axis=2)
        cs = jnp.sum(att_n[..., None] * he, axis=1)
        if h == 0:
            rs_ref[:] = rs
            cs_ref[:] = cs
        else:
            rs_ref[:] += rs
            cs_ref[:] += cs


def _mh_agg_bwd_kernel(e_ref, mr_ref, mc_ref, zr_ref, zc_ref, da_ref, dn_ref,
                       m_ref, ka_ref, kn_ref, grs_ref, gcs_ref,
                       de_ref, dmr_ref, dmc_ref, dzr_ref, dzc_ref, dhe_ref,
                       *, keep, nh):
    m3 = m_ref[:]
    grs = grs_ref[:]
    gcs = gcs_ref[:]
    # head-independent inner products (the heads' rs/cs were summed);
    # PRECOMPUTED by XLA — see _agg_bwd_kernel for why they cannot be
    # formed in-kernel on this toolchain
    datt_a = da_ref[:]                                   # [G, na, nt]
    datt_n = dn_ref[:]
    ka_nh = ka_ref.shape[0]
    for h in range(nh):
        ka = ka_ref[h if ka_nh > 1 else 0] if keep < 1.0 else None
        kn = kn_ref[h if ka_nh > 1 else 0] if keep < 1.0 else None
        att_a, att_n = _att_rect(e_ref[h], mr_ref[h], mc_ref[h], zr_ref[h],
                                 zc_ref[h], m3, ka, kn, keep)
        pa = datt_a * att_a
        pn = datt_n * att_n
        de_ref[h] = pa + pn
        s_a = jnp.sum(pa, axis=2)
        s_n = jnp.sum(pn, axis=1)
        dmr_ref[h] = -s_a
        dmc_ref[h] = -s_n
        dzr_ref[h] = -s_a / jnp.maximum(zr_ref[h], 1e-30)
        dzc_ref[h] = -s_n / jnp.maximum(zc_ref[h], 1e-30)
        dhe = (att_a[..., None] * grs[:, :, None, :]
               + att_n[..., None] * gcs[:, None, :, :])
        if h == 0:
            dhe_ref[:] = dhe.astype(dhe_ref.dtype)
        else:
            dhe_ref[:] += dhe.astype(dhe_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def gat_aggregate_mh(e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn,
                     keep, nh, g=DEFAULT_G, interpret=False):
    """Head-SUMMED (rs, cs) attention aggregation in ONE kernel launch.

    e f32 [nh,BT,na,nt]; m_row/z_row f32 [nh,BT,na]; m_col/z_col f32
    [nh,BT,nt] (head-LEADING, see module comment); h_e f32/bf16
    [BT,na,nt,H] (shared across heads); ka/kn f32 0/1 dropout keeps
    [nh,BT,na,nt] (or [1,BT,na,nt] to broadcast; ignored when
    keep == 1.0).  Returns rs [BT,na,H], cs [BT,nt,H] equal to the SUM
    over heads of gat_aggregate's outputs (divide by nh for the head
    mean).
    """
    out, _ = _mh_agg_fwd(e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn,
                         keep, nh, g, interpret)
    return out


def _mh_agg_fwd(e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn, keep,
                nh, g, interpret):
    BT, na, nt, H = h_e.shape
    bt_pad = -(-BT // g) * g
    he_p, m_p = (_pad_bt(x, bt_pad) for x in (h_e, mask3))
    e_p, mr_p, mc_p, zr_p, zc_p, ka_p, kn_p = (
        _pad_axis1(x, bt_pad)
        for x in (e, m_row, m_col, z_row, z_col, ka, kn))
    kernel = functools.partial(_mh_agg_fwd_kernel, keep=keep, nh=nh)
    rs, cs = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_mh_specs([e_p.shape, mr_p.shape, mc_p.shape, zr_p.shape,
                            zc_p.shape], g)
        + _specs([he_p.shape, m_p.shape], g)
        + _mh_specs([ka_p.shape, kn_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, H), (bt_pad, nt, H)], g)),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, H), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, nt, H), jnp.float32),
        ),
        interpret=interpret,
    )(e_p, mr_p, mc_p, zr_p, zc_p, he_p, m_p, ka_p, kn_p)
    return (rs[:BT], cs[:BT]), (e, m_row, m_col, z_row, z_col, h_e, mask3,
                                ka, kn)


def _mh_agg_bwd(keep, nh, g, interpret, res, grads):
    e, m_row, m_col, z_row, z_col, h_e, mask3, ka, kn = res
    g_rs, g_cs = grads
    BT, na, nt, H = h_e.shape
    bt_pad = -(-BT // g) * g
    datt_a, datt_n = _datt(h_e, g_rs, g_cs)
    da_p, dn_p, m_p, grs_p, gcs_p = (
        _pad_bt(x, bt_pad) for x in (datt_a, datt_n, mask3, g_rs, g_cs))
    e_p, mr_p, mc_p, zr_p, zc_p, ka_p, kn_p = (
        _pad_axis1(x, bt_pad)
        for x in (e, m_row, m_col, z_row, z_col, ka, kn))
    kernel = functools.partial(_mh_agg_bwd_kernel, keep=keep, nh=nh)
    de, dmr, dmc, dzr, dzc, dhe = pl.pallas_call(
        kernel,
        grid=(bt_pad // g,),
        in_specs=_mh_specs([e_p.shape, mr_p.shape, mc_p.shape, zr_p.shape,
                            zc_p.shape], g)
        + _specs([da_p.shape, dn_p.shape, m_p.shape], g)
        + _mh_specs([ka_p.shape, kn_p.shape], g)
        + _specs([grs_p.shape, gcs_p.shape], g),
        out_specs=tuple(_mh_specs([(nh, bt_pad, na, nt), (nh, bt_pad, na),
                                   (nh, bt_pad, nt), (nh, bt_pad, na),
                                   (nh, bt_pad, nt)], g)
                        + _specs([(bt_pad, na, nt, H)], g)),
        out_shape=(
            jax.ShapeDtypeStruct((nh, bt_pad, na, nt), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, nt), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, na), jnp.float32),
            jax.ShapeDtypeStruct((nh, bt_pad, nt), jnp.float32),
            jax.ShapeDtypeStruct((bt_pad, na, nt, H), h_e.dtype),
        ),
        interpret=interpret,
    )(e_p, mr_p, mc_p, zr_p, zc_p, da_p, dn_p, m_p, ka_p, kn_p, grs_p,
      gcs_p)
    return (de[:, :BT], dmr[:, :BT], dmc[:, :BT], dzr[:, :BT], dzc[:, :BT],
            dhe[:BT], jnp.zeros_like(mask3), jnp.zeros_like(ka),
            jnp.zeros_like(kn))


gat_aggregate_mh.defvjp(_mh_agg_fwd, _mh_agg_bwd)
