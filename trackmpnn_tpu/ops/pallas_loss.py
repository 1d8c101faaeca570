"""Fused Pallas kernels for the edge-side losses of the block train step.

After the fused round (pallas_block.py) the step's residual cost is ~40
small XLA fusions per scan step computing targets + per-detection CE +
BCE + F1 counts over the [BT, na, nt] rectangles (ablation: ~3.4 ms of
the 14.2 ms step, tools/bench_block_ablate.py).  This module collapses
the EDGE side of that work into three kernels around one global
segment-op group:

  L1 (per block):  logits_e = h_e_out @ w_e + b_e  (kept + written once),
      earliest-positive rowid per row (r_min), latest-positive row per
      column (max_i), column logsumexp (lse_col), and row-local
      logsumexp partials (m_r, s_r).
  XLA glue (detection-sized): sel1 = segment-min of r_min (the CE pick —
      equal for labels and targets, see train/block.py), per-detection
      future-side lse_d/size_d from the row partials, gathers back.
  L2 (per block):  targets (part_a | part_b), CE past/future terms, BCE
      log-probabilities and F1 counts — emitted as ONE [BT, 8] partials
      array (ce_past, ce_fut, bce_logpt_sum, bce_cnt, tp, fp, fn, pad).

The custom VJP recomputes the picks in a single backward kernel and
produces d h_e_out (through the output head), with d w_e / d b_e
grid-accumulated.  Cotangents arrive per-partial from the (tiny,
autodiffed) XLA code that combines the [BT, 8] array into window means.

Semantics contract: train/block.py::_block_targets_and_ce +
_per_window_bce_dual + the f1 count masks (ref loss.py:8-44, 77-115);
pinned by tests/test_pallas_loss.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackmpnn_tpu.ops.pallas_util import (
    block_specs as _specs,
    const_spec as _const_spec,
    pad_leading as _pad_bt,
)

from trackmpnn_tpu.losses.losses import EPS
from trackmpnn_tpu.ops.segment import segment_max, segment_min, segment_sum

import numpy as np

NEG = np.float32(-1e30)
BIG = np.float32(1 << 30)
DEFAULT_G = 8


def _specs(shapes, g):
    return [
        pl.BlockSpec((g,) + s[1:],
                     lambda i, nd=len(s): (i,) + (0,) * (nd - 1),
                     memory_space=pltpu.VMEM)
        for s in shapes
    ]


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i, nd=len(shape): (0,) * nd,
                        memory_space=pltpu.VMEM)


def _pad_bt(x, bt_pad):
    if x.shape[0] == bt_pad:
        return x
    pad = [(0, bt_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _rowid(ebnt, na, nt):
    """Original slot row of edge (i, j) per block; ebnt f32 [G, 2]."""
    g = ebnt.shape[0]
    # Mosaic only lowers integer iota; cast after (values are small ints)
    ii = jax.lax.broadcasted_iota(jnp.int32, (g, na, nt), 1).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (g, na, nt), 2).astype(jnp.float32)
    eb = jnp.expand_dims(ebnt[:, 0:1], 2)    # [g,1,1]; x[:, a:b, None]
    bnt = jnp.expand_dims(ebnt[:, 1:2], 2)   # mixes None into indexing,
    return eb + ii * bnt + jj                # which jnp lowers via GATHER


def _l1_kernel(heo_ref, we_ref, be_ref, lbl_ref, m3_ref, ebnt_ref,
               logit_ref, rmin_ref, mr_ref, sr_ref):
    G, na, nt, K = heo_ref.shape
    m3 = m3_ref[:]
    heo = heo_ref[:].astype(jnp.float32)
    logits = (jnp.dot(heo.reshape(G * na * nt, K), we_ref[:],
                      preferred_element_type=jnp.float32)
              .reshape(G, na, nt) + be_ref[:]) * m3
    logit_ref[:] = logits
    lbl = (lbl_ref[:] * m3) > 0.5
    rowid = _rowid(ebnt_ref[:], na, nt)

    rmin_ref[:] = jnp.min(jnp.where(lbl, rowid, BIG), axis=2)

    lm = jnp.where(m3 > 0.5, logits, NEG)
    m_r = jnp.max(lm, axis=2)
    safe_r = jnp.where(m_r > NEG / 2, m_r, 0.0)
    mr_ref[:] = m_r
    sr_ref[:] = jnp.sum(jnp.where(m3 > 0.5,
                                  jnp.exp(logits - safe_r[:, :, None]), 0.0),
                        axis=2)


def _picks(logits, lbl, m3, ebnt, sel1g, na, nt):
    """part_a / part_b / targets / column picks, recomputable everywhere."""
    G = logits.shape[0]
    rowid = _rowid(ebnt, na, nt)
    ii = jax.lax.broadcasted_iota(jnp.int32, (G, na, nt), 1).astype(jnp.float32)
    max_i = jnp.max(jnp.where(lbl, ii, -1.0), axis=1)
    part_a = lbl & (ii == max_i[:, None, :])
    part_b = lbl & (rowid == jnp.expand_dims(sel1g, 2))
    tpos = part_a | part_b
    col_has = jnp.any(tpos, axis=1)
    sel_i = jnp.max(jnp.where(tpos, ii, -1.0), axis=1)
    sel_mask = tpos & (ii == sel_i[:, None, :])
    return part_b, tpos, col_has, sel_mask


def _l2_kernel(logit_ref, lbl_ref, m3_ref, ebnt_ref, bna_ref,
               sel1_ref, lsed_ref, sized_ref, out_ref):
    G, na, nt = logit_ref.shape
    logits = logit_ref[:]
    m3 = m3_ref[:]
    mb = m3 > 0.5
    lbl = (lbl_ref[:] * m3) > 0.5
    part_b, tpos, col_has, sel_mask = _picks(
        logits, lbl, m3, ebnt_ref[:], sel1_ref[:], na, nt)

    lm = jnp.where(mb, logits, NEG)
    m_col = jnp.max(lm, axis=1)
    safe_c = jnp.where(m_col > NEG / 2, m_col, 0.0)
    s_col = jnp.sum(jnp.where(mb, jnp.exp(logits - safe_c[:, None, :]), 0.0),
                    axis=1)
    lse_col = safe_c + jnp.log(jnp.maximum(s_col, 1e-30))
    sel_logit = jnp.sum(jnp.where(sel_mask, logits, 0.0), axis=1)
    size_col = jnp.maximum(bna_ref[:, 0:1], 1.0)
    ce_past = jnp.sum(jnp.where(col_has, (lse_col - sel_logit)
                                / size_col, 0.0), axis=1, keepdims=True)

    def rsum(x):  # [G, na, nt] -> [G, 1]; Mosaic needs >= 2D values
        return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

    lsed = jnp.expand_dims(lsed_ref[:], 2)
    sized = jnp.maximum(jnp.expand_dims(sized_ref[:], 2), 1.0)
    ce_fut = rsum(jnp.where(part_b, (lsed - logits) / sized, 0.0))

    s = jax.nn.sigmoid(logits)
    pt = jnp.where(tpos, s, 1.0 - s)
    bce = rsum(jnp.where(mb, jnp.log(pt + EPS), 0.0))
    cnt = rsum(m3)
    pred = (s >= 0.5) & mb
    tp = rsum(jnp.where(pred & tpos, 1.0, 0.0))
    fp = rsum(jnp.where(pred & ~tpos, 1.0, 0.0))
    fn = rsum(jnp.where(mb & ~pred & tpos, 1.0, 0.0))

    out_ref[:] = jnp.concatenate(
        [ce_past, ce_fut, bce, cnt, tp, fp, fn, jnp.zeros_like(tp)], axis=1)


def _lb_kernel(heo_ref, we_ref, logit_ref, lbl_ref, m3_ref, ebnt_ref,
               bna_ref, sel1_ref, lsed_ref, sized_ref, wg_ref, dpart_ref,
               dheo_ref, dwe_ref, dbe_ref):
    """Backward: d logits from CE past/future + BCE, then the head VJP."""
    G, na, nt, K = heo_ref.shape
    logits = logit_ref[:]
    m3 = m3_ref[:]
    mb = m3 > 0.5
    lbl = (lbl_ref[:] * m3) > 0.5
    part_b, tpos, col_has, sel_mask = _picks(
        logits, lbl, m3, ebnt_ref[:], sel1_ref[:], na, nt)

    dpart = dpart_ref[:]
    d_cep = jnp.expand_dims(dpart[:, 0:1], 2)
    d_cef = jnp.expand_dims(dpart[:, 1:2], 2)
    d_bce = jnp.expand_dims(dpart[:, 2:3], 2)

    # ce_past: sum_cols col_has * (lse_col - sel_logit) / size_col
    lm = jnp.where(mb, logits, NEG)
    m_col = jnp.max(lm, axis=1)
    safe_c = jnp.where(m_col > NEG / 2, m_col, 0.0)
    e_col = jnp.where(mb, jnp.exp(logits - safe_c[:, None, :]), 0.0)
    s_col = jnp.maximum(jnp.sum(e_col, axis=1), 1e-30)
    soft_col = e_col / s_col[:, None, :]
    w_col = (col_has / jnp.maximum(bna_ref[:, 0:1], 1.0))[:, None, :]
    dl = d_cep * w_col * (soft_col - sel_mask.astype(jnp.float32))

    # ce_fut: sum part_b * (lse_d - logits) / size_d.  The lse_d spread
    # weight wg (per row) is formed in the XLA glue: it carries the
    # cotangent of the block holding the det's part_b edge, which need
    # not be THIS block - d_cef only multiplies the local direct term.
    sized = jnp.maximum(jnp.expand_dims(sized_ref[:], 2), 1.0)
    soft_d = jnp.where(mb, jnp.exp(logits - jnp.expand_dims(lsed_ref[:], 2)),
                       0.0)
    dl += (jnp.expand_dims(wg_ref[:], 2) * soft_d
           - d_cef * part_b.astype(jnp.float32) / sized)

    # bce: sum log(pt + EPS);  d/dlogits = sgn * s(1-s)/(pt+EPS)
    s = jax.nn.sigmoid(logits)
    pt = jnp.where(tpos, s, 1.0 - s)
    sgn = jnp.where(tpos, 1.0, -1.0)
    dl += d_bce * jnp.where(mb, sgn * s * (1.0 - s) / (pt + EPS), 0.0)

    dl = dl * m3  # logits were masked on the way out of L1
    dheo_ref[:] = (dl[..., None]
                   * we_ref[:].reshape(1, 1, 1, K)).astype(dheo_ref.dtype)
    # dwe as [1, K] (transposed outside).  Mosaic gotchas here: a [R, 1]
    # reshape of dl puts the collapsed axis in lanes (unsupported shape
    # cast), and stepped 4D reductions hit an invalid-relayout check —
    # flatten to 2D with K in lanes and reduce over sublanes instead.
    prod = heo_ref[:].astype(jnp.float32) * dl[..., None]    # [G,na,nt,K]
    dwe = jnp.sum(prod.reshape(G * na * nt, K), axis=0, keepdims=True)
    dl2 = dl.reshape(G * na, nt)
    dbe = jnp.sum(jnp.sum(dl2, axis=0, keepdims=True), axis=1,
                  keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwe_ref[:] = dwe
        dbe_ref[:] = dbe

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        dwe_ref[:] += dwe
        dbe_ref[:] += dbe


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def edge_losses(h_eo, w_e, b_e, lbl, mask3, ebnt, bna, active_idx, act_m,
                nD, g=DEFAULT_G, interpret=False):
    """Edge-side targets + CE + BCE + F1 partials, fused.

    h_eo f32/bf16 [BT,na,nt,K] (post-round edge hidden); w_e [K,1], b_e
    [1,1]; lbl f32 [BT,na,nt] (1.0 where edge label == 1); mask3 f32 0/1;
    ebnt f32 [BT,2] (edge_base, blk_nt); bna f32 [BT,1] (blk_na);
    active_idx i32 [BT,na] global det slot per row, act_m bool [BT*na].

    Returns partials f32 [BT, 8]: columns (ce_past, ce_fut, bce_logpt_sum,
    bce_count, tp, fp, fn, 0).  Gradients flow to h_eo/w_e/b_e only.
    """
    out, _ = _fwd(h_eo, w_e, b_e, lbl, mask3, ebnt, bna, active_idx, act_m,
                  nD, g, interpret)
    return out


def _glue(rmin, mr, sr, cnt_row, active_idx, act_m, nD):
    """Detection-sized segment ops between L1 and L2."""
    flat = active_idx.reshape(-1)
    sel1 = segment_min(rmin.reshape(-1), flat, nD, mask=act_m)
    m_star = segment_max(mr.reshape(-1), flat, nD, mask=act_m)
    safe = jnp.where(m_star > NEG / 2, m_star, 0.0)
    s_tot = segment_sum(sr.reshape(-1) * jnp.exp(
        jnp.minimum(mr.reshape(-1) - safe[jnp.clip(flat, 0, nD - 1)], 0.0)),
        flat, nD, mask=act_m)
    size_d = segment_sum(cnt_row.reshape(-1), flat, nD, mask=act_m)
    # empty dets get lse_d = 0 (their part_b set is empty; a -69 proxy would
    # make the backward's exp(logits - lse_d) overflow-prone)
    lse_d = jnp.where(size_d > 0.5,
                      safe + jnp.log(jnp.maximum(s_tot, 1e-30)), 0.0)
    return sel1[active_idx], lse_d[active_idx], size_d[active_idx]


def _fwd(h_eo, w_e, b_e, lbl, mask3, ebnt, bna, active_idx, act_m,
         nD, g, interpret):
    BT, na, nt, K = h_eo.shape
    bt_pad = -(-BT // g) * g
    heo_p, lbl_p, m3_p, ebnt_p = (
        _pad_bt(x, bt_pad) for x in (h_eo, lbl, mask3, ebnt))

    k1 = pl.pallas_call(
        _l1_kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([heo_p.shape], g)
        + [_const_spec(w_e.shape), _const_spec(b_e.shape)]
        + _specs([lbl_p.shape, m3_p.shape, ebnt_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, na, nt), (bt_pad, na),
                                (bt_pad, na), (bt_pad, na)], g)),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in [
            (bt_pad, na, nt), (bt_pad, na), (bt_pad, na), (bt_pad, na)]),
        interpret=interpret,
    )
    logits, rmin, mr, sr = (
        x[:BT] for x in k1(heo_p, w_e, b_e, lbl_p, m3_p, ebnt_p))

    # rows with any valid edge contribute blk_nt to the det's future size
    row_live = mask3[:, :, 0] > 0.5  # col 0 is valid whenever blk_nt > 0
    cnt_row = jnp.where(row_live, ebnt[:, 1][:, None], 0.0)
    sel1g, lsedg, sizedg = _glue(rmin, mr, sr, cnt_row, active_idx,
                                 act_m, nD)

    bna_p, sel1_p, lsed_p, sized_p = (
        _pad_bt(x, bt_pad) for x in (bna, sel1g, lsedg, sizedg))
    k2 = pl.pallas_call(
        _l2_kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([(bt_pad, na, nt), lbl_p.shape, m3_p.shape,
                         ebnt_p.shape, bna_p.shape, sel1_p.shape,
                         lsed_p.shape, sized_p.shape], g),
        out_specs=tuple(_specs([(bt_pad, 8)], g)),
        out_shape=(jax.ShapeDtypeStruct((bt_pad, 8), jnp.float32),),
        interpret=interpret,
    )
    (partials,) = k2(_pad_bt(logits, bt_pad), lbl_p, m3_p, ebnt_p, bna_p,
                     sel1_p, lsed_p, sized_p)
    partials = partials[:BT]
    res = (h_eo, w_e, lbl, mask3, ebnt, bna, logits, rmin, sel1g, lsedg,
           sizedg, active_idx, act_m)
    return partials, res


def _bwd(nD, g, interpret, res, d_partials):
    (h_eo, w_e, lbl, mask3, ebnt, bna, logits, rmin, sel1g, lsedg,
     sizedg, active_idx, act_m) = res
    BT, na, nt, K = h_eo.shape
    # lse_d spread coefficient: route each det's part_b-block cotangent
    # (divided by size_d) back to ALL of the det's rows
    has = (rmin == sel1g) & (sel1g < BIG / 2)
    w_rows = jnp.where(has, d_partials[:, 1][:, None], 0.0)
    wd = segment_sum(w_rows.reshape(-1), active_idx.reshape(-1), nD,
                     mask=act_m)
    wg = wd[active_idx] / jnp.maximum(sizedg, 1.0)
    bt_pad = -(-BT // g) * g
    args = [_pad_bt(x, bt_pad) for x in
            (h_eo, logits, lbl, mask3, ebnt, bna, sel1g, lsedg, sizedg,
             wg, d_partials)]
    heo_p = args[0]

    dheo, dwe, dbe = pl.pallas_call(
        _lb_kernel,
        grid=(bt_pad // g,),
        in_specs=_specs([heo_p.shape], g) + [_const_spec(w_e.shape)]
        + _specs([(bt_pad, na, nt), (bt_pad, na, nt), (bt_pad, na, nt),
                  (bt_pad, 2), (bt_pad, 1), (bt_pad, na), (bt_pad, na),
                  (bt_pad, na), (bt_pad, na), (bt_pad, 8)], g),
        out_specs=tuple(_specs([(bt_pad, na, nt, K)], g)
                        + [_const_spec((1, K)), _const_spec((1, 1))]),
        out_shape=(
            jax.ShapeDtypeStruct((bt_pad, na, nt, K), h_eo.dtype),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(args[0], w_e, args[1], args[2], args[3], args[4], args[5], args[6],
      args[7], args[8], args[9], args[10])
    zeros = (jnp.zeros_like(lbl), jnp.zeros_like(mask3),
             jnp.zeros_like(ebnt), jnp.zeros_like(bna))
    return (dheo[:BT], dwe.T, dbe, *zeros, None, None)


edge_losses.defvjp(_fwd, _bwd)
