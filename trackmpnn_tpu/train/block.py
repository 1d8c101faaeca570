"""Block-structured training step: the scatter-free fast path.

The packed step (train/packed.py) is semantically complete but profiles at
~2% MXU: XLA lowers every arbitrary-index gather/scatter over the [B*cap]
row axis to ~13ns-per-row serialized sequences, and the step does a handful
of them per message-passing round plus ~5 more in targets+CE (CLAUDE.md
perf log).  The fix is algorithmic, not kernel-level: every step's new
edges form a COMPLETE BIPARTITE block active x new (ref graph.py:281 -
`n_new = na*nt + nt` with rows laid out i*nt + j), so the graph is a union
of dense rectangles and none of the per-edge index chasing is necessary:

  * edge hidden state lives in padded block layout  [B*T, na_cap, nt_cap, H]
    and detection hidden state in a compact per-window layout [B*capD, H];
  * node_support (h[past] - h[fut] per edge) = broadcast difference of a
    tiny active-row gather ([B*T, na_cap] rows) and a new-det gather
    ([B*T, nt_cap] rows) - serialized rows drop from O(edges) to O(active);
  * edge_support (signed incident sums per det) = dense row/col sums of the
    rectangles + ONE segment-sum of [B*T*(na_cap+nt_cap)] rows;
  * a detection's past incident edge set is exactly one block COLUMN, so
    the per-detection CE past term is a dense per-column reduction with no
    scatter at all; the future sets touch only active lists.

Semantics are identical to packed_window_forward (tests/test_block_step.py
pins loss, aux and grads); supported configs: msg 'diff'/'concat', with or
without GAT attention heads (the GAT softmax over a detection's incident
edges decomposes over the same rectangles - see _block_gat_support).
"""

from __future__ import annotations

import os
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.losses.losses import EPS
from trackmpnn_tpu.models import mpnn, nn
from trackmpnn_tpu.ops import segment_max, segment_min, segment_sum

_BIG = np.float32(1 << 30)  # larger than any slot row id (exact in f32)


class BlockBatch(NamedTuple):
    """B windows in dual layout: compact detections + padded edge rectangles.

    Detection slots of window w occupy [w*capD, (w+1)*capD); block b of
    window w is flat block id w*t_cap + b (one block per schedule step; a
    step that appended nothing is an empty block with nt = 0)."""

    det_feat: jnp.ndarray    # f32[B*capD, F]
    det_label: jnp.ndarray   # i32[B*capD]
    det_step: jnp.ndarray    # i32[B*capD]  introduction step (t_cap = padding)
    active_idx: jnp.ndarray  # i32[B*T, na_cap] global compact det id per row i
    newdet_idx: jnp.ndarray  # i32[B*T, nt_cap] global compact det id per col j
    blk_na: jnp.ndarray      # i32[B*T]
    blk_nt: jnp.ndarray      # i32[B*T]
    blk_edge_base: jnp.ndarray  # i32[B*T] original slot row of edge (0, 0)
    edge_label: jnp.ndarray  # i32[B*T, na_cap, nt_cap]
    step_valid: jnp.ndarray  # bool[t_cap, B]

    @property
    def t_cap(self) -> int:
        return self.step_valid.shape[0]

    @property
    def n_windows(self) -> int:
        return self.step_valid.shape[1]

    @property
    def capD(self) -> int:
        return self.det_feat.shape[0] // self.n_windows

    @property
    def na_cap(self) -> int:
        return self.active_idx.shape[1]

    @property
    def nt_cap(self) -> int:
        return self.newdet_idx.shape[1]


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


def block_dims(schedules: List) -> tuple:
    """(capD, na_cap, nt_cap) buckets for a batch of WindowSchedules."""
    capD = na = nt = 1
    for ws in schedules:
        capD = max(capD, int(np.sum(ws.is_det[: ws.n_rows])))
        for blk in ws.blocks:
            if blk is not None:
                na, nt = max(na, blk.na), max(nt, blk.nt)
    return _round_up(capD, 64), _round_up(na, 8), _round_up(nt, 8)


def build_block_batch(schedules: List, t_cap: int, capD=None, na_cap=None,
                      nt_cap=None) -> BlockBatch:
    """Pack WindowSchedules (graph/schedule.py) into block-table form."""
    d_capD, d_na, d_nt = block_dims(schedules)
    capD = capD or d_capD
    na_cap = na_cap or d_na
    nt_cap = nt_cap or d_nt
    B = len(schedules)
    F = schedules[0].feat.shape[1]

    det_feat = np.zeros((B * capD, F), np.float32)
    det_label = np.zeros(B * capD, np.int32)
    det_step = np.full(B * capD, t_cap, np.int32)
    active_idx = np.zeros((B * t_cap, na_cap), np.int32)
    newdet_idx = np.zeros((B * t_cap, nt_cap), np.int32)
    blk_na = np.zeros(B * t_cap, np.int32)
    blk_nt = np.zeros(B * t_cap, np.int32)
    blk_edge_base = np.zeros(B * t_cap, np.int32)
    edge_label = np.zeros((B * t_cap, na_cap, nt_cap), np.int32)
    step_valid = np.zeros((t_cap, B), bool)

    for w, ws in enumerate(schedules):
        n = ws.n_rows
        is_det = np.asarray(ws.is_det[:n])
        dr = np.where(is_det)[0]
        ndet = len(dr)
        if ndet > capD:
            raise ValueError(f"capD {capD} < detections {ndet}")
        dc = np.full(n, -1, np.int64)  # slot row -> compact det id
        dc[dr] = np.arange(ndet)
        dof = w * capD
        det_feat[dof : dof + ndet] = np.asarray(ws.feat)[dr]
        det_label[dof : dof + ndet] = np.asarray(ws.label)[dr]
        for s in range(ws.n_steps):
            step_valid[s, w] = True
            b, a = int(ws.n_before[s]), int(ws.n_after[s])
            new_dets = dc[np.arange(b, a)[is_det[b:a]]]
            det_step[dof + new_dets] = s
            blk = ws.blocks[s]
            bid = w * t_cap + s
            if blk is None:
                if a > b:
                    raise ValueError(f"step {s} added rows but has no block")
                continue
            if blk.na > na_cap or blk.nt > nt_cap:
                raise ValueError("block exceeds (na_cap, nt_cap)")
            blk_na[bid], blk_nt[bid] = blk.na, blk.nt
            blk_edge_base[bid] = blk.edge_base
            active_idx[bid, : blk.na] = dof + dc[blk.active_rows]
            newdet_idx[bid, : blk.nt] = dof + dc[blk.det_base] + np.arange(blk.nt)
            lbl = np.asarray(ws.label)[
                blk.edge_base : blk.edge_base + blk.na * blk.nt
            ].reshape(blk.na, blk.nt)
            edge_label[bid, : blk.na, : blk.nt] = lbl

    j = jnp.asarray
    return BlockBatch(
        det_feat=j(det_feat), det_label=j(det_label), det_step=j(det_step),
        active_idx=j(active_idx), newdet_idx=j(newdet_idx),
        blk_na=j(blk_na), blk_nt=j(blk_nt), blk_edge_base=j(blk_edge_base),
        edge_label=j(edge_label), step_valid=j(step_valid),
    )


# ------------------------------------------------------------ device step ----
def _bn_with_phantom_rows(params, stats, y1, mask_d, n_phantom, *, train,
                          axis_name=None):
    """BatchNorm over {y1 rows where mask_d} + n_phantom copies of lin1's
    bias vector (what zero-feature new edge rows contribute in the row
    layout, ref track_mpnn.py:58-61: BN statistics include them but their
    transformed value is never used).  Returns (y_normed, new_stats, count).

    axis_name: psum the moments over that mesh axis (sync-BN), so the
    data-sharded step matches the single-device cross-window batch stats.
    """
    b1 = params["lin1"]["b"]
    mask_f = mask_d.astype(y1.dtype)[:, None]
    nph = n_phantom.astype(y1.dtype)
    psum = ((lambda v: jax.lax.psum(v, axis_name)) if axis_name
            else (lambda v: v))
    cnt_raw = psum(jnp.sum(mask_f) + nph)
    if train:
        cnt = jnp.maximum(cnt_raw, 1.0)
        mean = psum(jnp.sum(y1 * mask_f, axis=0) + nph * b1) / cnt
        var_b = psum(jnp.sum(((y1 - mean) ** 2) * mask_f, axis=0)
                     + nph * (b1 - mean) ** 2) / cnt
        y = (y1 - mean) * jax.lax.rsqrt(var_b + nn.BN_EPS)
        var_u = var_b * cnt / jnp.maximum(cnt - 1.0, 1.0)
        new_stats = {
            "mean": (1 - nn.BN_MOMENTUM) * stats["mean"] + nn.BN_MOMENTUM * mean,
            "var": (1 - nn.BN_MOMENTUM) * stats["var"] + nn.BN_MOMENTUM * var_u,
        }
    else:
        y = (y1 - stats["mean"]) * jax.lax.rsqrt(stats["var"] + nn.BN_EPS)
        new_stats = stats
    bn = params["bn"]
    return y * bn["gamma"] + bn["beta"], new_stats, cnt_raw


def _hoisted_bn_all_steps(bp_in, bs, y1, ids_c, det_isnew, nph_T, T, train,
                          axis_name):
    """Per-intro-step BatchNorm for ALL steps at once.

    _bn_with_phantom_rows pools statistics over the dets INTRODUCED at a
    step (+ phantom edge rows) — step-local, so the whole thing is a pair
    of segment reductions keyed on det_step instead of T in-scan launches,
    and the sequential running-stat EMA folds in closed form:
        final = (1-m)^K old + m * sum_s q_s (1-m)^{r_s} stat_s
    (q_s = step had rows, r_s = # such steps after s).  Semantics match the
    in-scan version exactly up to f32 reassociation.

    Returns (y_normed [nD, H] — each det by its own intro step's stats,
    garbage-but-finite on padding rows — and the final running stats)."""
    b1 = bp_in["lin1"]["b"]
    H = y1.shape[1]
    psum = ((lambda v: jax.lax.psum(v, axis_name)) if axis_name
            else (lambda v: v))
    if train:
        nph_T = psum(nph_T)  # phantom rows pool across shards like dets
        cnt_det = segment_sum(jnp.ones((y1.shape[0], 1), y1.dtype), ids_c, T,
                              mask=det_isnew)[:, 0]
        cnt_raw = psum(cnt_det) + nph_T                           # [T]
        cnt = jnp.maximum(cnt_raw, 1.0)[:, None]
        sum_T = psum(segment_sum(y1, ids_c, T, mask=det_isnew))   # [T, H]
        mean_T = (sum_T + nph_T[:, None] * b1) / cnt
        d2 = (y1 - mean_T[ids_c]) ** 2
        var_T = (psum(segment_sum(d2, ids_c, T, mask=det_isnew))
                 + nph_T[:, None] * (b1 - mean_T) ** 2) / cnt
        y = (y1 - mean_T[ids_c]) * jax.lax.rsqrt(var_T[ids_c] + nn.BN_EPS)
        var_u = var_T * cnt / jnp.maximum(cnt - 1.0, 1.0)
        m = nn.BN_MOMENTUM
        q = (cnt_raw > 0).astype(y1.dtype)                        # [T]
        r = jnp.cumsum(q[::-1])[::-1] - q                         # suffix count
        k = jnp.sum(q)
        w = (m * q * (1 - m) ** r)[:, None]                       # [T, 1]
        new_stats = {
            "mean": (1 - m) ** k * bs["mean"] + jnp.sum(w * mean_T, 0),
            "var": (1 - m) ** k * bs["var"] + jnp.sum(w * var_u, 0),
        }
    else:
        y = (y1 - bs["mean"]) * jax.lax.rsqrt(bs["var"] + nn.BN_EPS)
        new_stats = bs
    bn = bp_in["bn"]
    return y * bn["gamma"] + bn["beta"], new_stats


class StaticTargets(NamedTuple):
    """Per-batch target structure: constant across scan steps.

    Every pick in the target derivation (ref loss.py:8-44) is label- and
    layout-determined, not logits-determined, and is INVARIANT under the
    growing live set: part_a is within-block; part_b marks each det's
    earliest positive-label edge globally, and since slot rowids grow with
    schedule step and live sets grow monotonically, the dynamic
    min-over-live-rows equals the global min whenever the det has any live
    positive edge (its earliest positive block is live no later than any
    other).  Runtime masking by em3 restores the per-step semantics."""

    tpos: jnp.ndarray      # bool[BT, na, nt] target-positive edges
    part_b: jnp.ndarray    # bool[BT, na, nt] earliest-positive per det
    col_has: jnp.ndarray   # bool[BT, nt]     column has a positive target
    sel_mask: jnp.ndarray  # bool[BT, na, nt] latest positive per column


class _SegView(NamedTuple):
    """Step-major prefix slice of the per-block arrays (first P blocks).

    Block q = s*B + w (s = schedule step, w = window), so the blocks live
    at scan step s are exactly the first (s+1)*B — prefix slices never
    touch dead future blocks."""

    act: jnp.ndarray     # i32[P, na_cap] compact det id per active row
    new: jnp.ndarray     # i32[P, nt_cap] compact det id per new-det col
    bna: jnp.ndarray     # i32[P]
    bnt: jnp.ndarray     # i32[P]
    row_m: jnp.ndarray   # bool[P, na_cap]
    col_m: jnp.ndarray   # bool[P, nt_cap]
    bw: jnp.ndarray      # i32[P] block -> window
    bs: jnp.ndarray      # i32[P] block -> step
    st: "StaticTargets"  # per-block static target picks, step-major
    seg: jnp.ndarray     # i32[P*(na+nt)] incident-union segment ids
    act_l: jnp.ndarray = None  # f32[P, na_cap] window-LOCAL act ids (es krnl)
    new_l: jnp.ndarray = None  # f32[P, nt_cap] window-LOCAL new ids


def build_static_targets(bb: BlockBatch, row_m, col_m) -> StaticTargets:
    nD = bb.det_feat.shape[0]
    na_cap, nt_cap = bb.na_cap, bb.nt_cap
    ii = jnp.arange(na_cap, dtype=jnp.int32)[None, :, None]
    jj = jnp.arange(nt_cap, dtype=jnp.int32)[None, None, :]
    # original slot row of edge (i, j) - the reference's tie-break key.
    # Kept in float32 throughout (slot rows << 2^24, so exact).
    rowid = (bb.blk_edge_base[:, None, None] + ii * bb.blk_nt[:, None, None]
             + jj).astype(jnp.float32)
    msk = row_m[:, :, None] & col_m[:, None, :]
    lbl_pos = (bb.edge_label == 1) & msk
    # past part: latest (max i) positive-label edge in each column
    max_i = jnp.max(jnp.where(lbl_pos, ii, -1), axis=1)         # [BT, nt]
    part_a = lbl_pos & (ii == max_i[:, None, :])
    # future part: earliest (min rowid) positive-label edge out of each det
    r_min = jnp.min(jnp.where(lbl_pos, rowid, _BIG), axis=2)    # [BT, na]
    act_m = (row_m & (bb.blk_nt > 0)[:, None]).reshape(-1)
    sel1 = segment_min(r_min.reshape(-1), bb.active_idx.reshape(-1), nD,
                       mask=act_m)
    part_b = lbl_pos & (rowid == sel1[bb.active_idx][:, :, None])
    tpos = part_a | part_b
    col_has = jnp.any(tpos, axis=1)
    sel_i = jnp.max(jnp.where(tpos, ii, -1), axis=1)  # latest positive
    sel_mask = tpos & (ii == sel_i[:, None, :])
    return StaticTargets(tpos=tpos, part_b=part_b, col_has=col_has,
                         sel_mask=sel_mask)


def _block_targets_and_ce(logits_d, logits_e, det_label, active_idx,
                          blk_na, blk_nt, st, det_live, blk_live, row_m,
                          col_m, em3):
    """Targets + per-detection CE in block layout.

    Same contract as losses.targets_and_ce (ref loss.py:8-44, 77-115):
      * a detection's past incident set is one block column -> the "latest
        positive" pick and the CE past term are dense column reductions;
      * future sets span the active lists of later blocks -> per-(block,
        active-row) dense partials + one tiny segment reduction per
        quantity over the active index lists;
      * all label-side picks come precomputed (build_static_targets) and
        are only re-masked by the live set here.
    Block-order agnostic (works on step-major prefix slices).
    Returns (targets_d i32, targets_e i32, ce_sum).
    """
    nD = logits_d.shape[0]
    tpos = st.tpos & em3
    targets_e = tpos.astype(jnp.int32)
    targets_d = ((det_label == 1) & det_live).astype(jnp.int32)
    act_flat = active_idx.reshape(-1)
    act_m = (blk_live[:, None] & row_m).reshape(-1)

    # ---- CE past side: dense per-column ----
    neg = jnp.float32(-1e30)
    col_has = st.col_has & blk_live[:, None]                    # [BT, nt]
    le = jnp.where(em3, logits_e, neg)
    m_col = jnp.max(le, axis=1)                                 # [BT, nt]
    # shift EVERY nonempty column (not just target-positive ones): an
    # unshifted live column can exp-overflow to inf, and the masked-out
    # forward still NaNs the backward through 0 * inf
    safe_m = jnp.where(m_col > neg / 2, m_col, 0.0)
    sumexp = jnp.sum(jnp.where(em3, jnp.exp(logits_e - safe_m[:, None, :]), 0.0), axis=1)
    lse_col = safe_m + jnp.log(jnp.maximum(sumexp, 1e-30))
    sel_logit = jnp.sum(jnp.where(st.sel_mask, logits_e, 0.0), axis=1)
    size_col = blk_na[:, None].astype(jnp.float32)
    ce_past = jnp.sum(jnp.where(col_has, (lse_col - sel_logit)
                                / jnp.maximum(size_col, 1.0), 0.0))

    # ---- CE future side: per-(block, active-row) partials + segment ops ----
    # The shift must be PER DETECTION (a single global max lets exp()
    # underflow to 0 for dets whose logits sit far below the batch max,
    # silently corrupting their CE term and killing their gradient).
    m_r = jnp.max(jnp.where(em3, logits_e, neg), axis=2)        # [BT, na]
    m_d = jax.lax.stop_gradient(
        segment_max(m_r.reshape(-1), act_flat, nD, mask=act_m))
    safe_d = jnp.where(m_d > neg / 2, m_d, 0.0)
    shift = safe_d[active_idx][:, :, None]
    sexp_row = jnp.sum(jnp.where(em3, jnp.exp(logits_e - shift), 0.0), axis=2)
    cnt_row = jnp.where(blk_live[:, None] & row_m,
                        blk_nt[:, None].astype(jnp.float32), 0.0)
    packed = jnp.stack([sexp_row, cnt_row], axis=-1).reshape(-1, 2)
    sums = segment_sum(packed, act_flat, nD, mask=act_m)
    lse_d = safe_d + jnp.log(jnp.maximum(sums[:, 0], 1e-30))
    size_d = sums[:, 1]
    # the earliest positive-TARGET edge out of a det IS its earliest
    # positive-LABEL edge (part_b): that edge is always in the target set
    # and targets are a subset of labels
    part_b = st.part_b & em3
    det_row = jnp.stack([lse_d, size_d], axis=1)
    rb = det_row[active_idx]                                 # [BT, na, 2]
    per_edge = jnp.where(
        part_b, (rb[:, :, None, 0] - logits_e) / jnp.maximum(rb[:, :, None, 1], 1.0), 0.0)
    ce_fut = jnp.sum(per_edge)

    return targets_d, targets_e, ce_past + ce_fut


def _block_gat_support(gat_params, h_d_b, h_e_b, active_idx, newdet_idx, em3,
                       seg, vm, nD, drop_rng, train, fused=False, m3=None,
                       interp=False, wsc=None, act_l=None, new_l=None):
    """GAT-attention edge_support in dual layout (ref layers.py:7-46).

    A detection's incident edge set is the union of its block ROWS (it is
    the past endpoint, sign +1) and its introduction block's COLUMN (future
    endpoint, sign -1), so the per-detection softmax over that set is two
    dense rectangle reductions plus one segment max/sum over the active/new
    index lists - the exact communication pattern of the signed
    edge_support, still scatter-free.  Matches mpnn._gat_head numerics
    (leaky-relu scores from |h_att[past]-h_att[fut]| @ a, softmax per
    endpoint, p=0.5 train-time dropout on the attention weights, signed
    aggregation of incident edge hiddens, mean over heads); the dropout
    RNG stream differs from the row layout (fused path: two stacked
    [nh,BT,na,nt] draws; XLA path: two draws per head, vs the row
    layout's one [2N] draw) - identical in distribution.
    """
    H = h_d_b.shape[-1]
    NEG = jnp.float32(-1e30)
    keep = 1.0 - mpnn.ATT_DROPOUT if (train and mpnn.ATT_DROPOUT > 0.0) \
        else 1.0
    if fused:
        # Round 4: ALL heads in one stacked pass (ops/pallas_gat.py _mh
        # kernels) — 2 launches per step total instead of 2 per head, one
        # gather pair for every head's projections, and ONE segment
        # max/sum/aggregate-sum for the whole head set.  The whole
        # attention chain stays in VMEM: scores + local max/exp-sums in
        # one kernel (two-pass logsumexp; the global normalizer is
        # assembled from det-sized pieces), att x h_e in the other, so no
        # score rectangle crosses HBM more than once and the scan stacks
        # no rectangle residuals.
        from trackmpnn_tpu.ops.pallas_gat import DEFAULT_G as PG_G
        from trackmpnn_tpu.ops.pallas_gat import (gat_aggregate_mh,
                                                  gat_scores_stats_mh)
        nh = len(gat_params)
        w_att = jnp.concatenate([hp["W_att"] for hp in gat_params], axis=1)
        a_att = jnp.concatenate([hp["a"] for hp in gat_params], axis=0)
        h_att = h_d_b @ w_att                             # [nD, nh*H]
        ha = h_att[active_idx]                            # [BT, na, nh*H]
        hn = h_att[newdet_idx]                            # [BT, nt, nh*H]
        e, rmax, cmax, sal, sbl = gat_scores_stats_mh(
            ha, hn, a_att, m3, float(mpnn.LEAKY_ALPHA), nh, PG_G, interp)
        # the shift is value/grad-invariant: stop-grad it (softmax
        # convention) so no cotangents ride the segment_max argmax
        # (all head-stacked arrays are head-LEADING [nh, BT, ...]; a
        # mid-array head axis crashes this Mosaic toolchain, see
        # ops/pallas_gat.py)
        rmax = jax.lax.stop_gradient(rmax)                # [nh, BT, na]
        cmax = jax.lax.stop_gradient(cmax)                # [nh, BT, nt]
        # per-head segment reductions in ONE op: rows aligned with seg =
        # [active rows | new cols], heads as the feature dim
        r_t = jnp.transpose(rmax, (1, 2, 0)).reshape(-1, nh)
        c_t = jnp.transpose(cmax, (1, 2, 0)).reshape(-1, nh)
        m_d = segment_max(jnp.concatenate([r_t, c_t]), seg, nD,
                          mask=vm)                        # [nD, nh]
        safe_m = jnp.where(m_d > NEG / 2, m_d, 0.0)
        m_row = jnp.transpose(safe_m[active_idx], (2, 0, 1))  # [nh, BT, na]
        m_col = jnp.transpose(safe_m[newdet_idx], (2, 0, 1))  # [nh, BT, nt]
        # exp(NEG - m) underflows to exactly 0 for all-masked rows
        sa = jnp.exp(rmax - m_row) * sal
        sb = jnp.exp(cmax - m_col) * sbl
        z = segment_sum(jnp.concatenate(
            [jnp.transpose(sa, (1, 2, 0)).reshape(-1, nh),
             jnp.transpose(sb, (1, 2, 0)).reshape(-1, nh)]), seg, nD,
            mask=vm)                                      # [nD, nh]
        z_row = jnp.transpose(z[active_idx], (2, 0, 1))
        z_col = jnp.transpose(z[newdet_idx], (2, 0, 1))
        if keep < 1.0:
            mh_shape = (nh,) + em3.shape
            ka = jax.random.bernoulli(jax.random.fold_in(drop_rng, 0),
                                      keep, mh_shape).astype(jnp.float32)
            kn = jax.random.bernoulli(jax.random.fold_in(drop_rng, 1),
                                      keep, mh_shape).astype(jnp.float32)
        else:
            ka = kn = m3[None]                            # broadcast head
        rs, cs = gat_aggregate_mh(e, m_row, m_col, z_row, z_col, h_e_b,
                                  m3, ka, kn, keep, nh, PG_G, interp)
        if wsc is not None:
            # attention weights are zero at every padded/masked cell, so
            # rs/cs scatter zeros there — the window_scatter kernel needs
            # no extra mask (same argument as the non-GAT es path)
            es = wsc(jnp.concatenate([rs, -cs], axis=1),
                     jnp.concatenate([act_l, new_l], axis=1))
        else:
            es = segment_sum(
                jnp.concatenate([rs.reshape(-1, H), -cs.reshape(-1, H)]),
                seg, nD, mask=vm)
        return es / nh
    acc = None
    for hi, hp in enumerate(gat_params):
        h_att = h_d_b @ hp["W_att"]                          # [nD, H]
        ha = h_att[active_idx]                            # [BT, na, H]
        hn = h_att[newdet_idx]                            # [BT, nt, H]
        if keep < 1.0:
            ka = jax.random.bernoulli(jax.random.fold_in(drop_rng, 2 * hi),
                                      keep, em3.shape)
            kn = jax.random.bernoulli(jax.random.fold_in(drop_rng, 2 * hi + 1),
                                      keep, em3.shape)
        a_in = jnp.abs(ha[:, :, None, :] - hn[:, None, :, :])
        e = jax.nn.leaky_relu((a_in @ hp["a"])[..., 0],
                              mpnn.LEAKY_ALPHA)
        e_m = jnp.where(em3, e, NEG)
        rmax = jnp.max(e_m, axis=2)                      # [BT, na]
        cmax = jnp.max(e_m, axis=1)                      # [BT, nt]
        m_d = segment_max(jnp.concatenate([rmax.reshape(-1),
                                           cmax.reshape(-1)]),
                          seg, nD, mask=vm)              # [nD]
        safe_m = jnp.where(m_d > NEG / 2, m_d, 0.0)
        ea = jnp.where(em3,
                       jnp.exp(e - safe_m[active_idx][:, :, None]),
                       0.0)
        en = jnp.where(em3,
                       jnp.exp(e - safe_m[newdet_idx][:, None, :]),
                       0.0)
        z = segment_sum(jnp.concatenate([jnp.sum(ea, 2).reshape(-1),
                                         jnp.sum(en, 1).reshape(-1)]),
                        seg, nD, mask=vm)                # [nD]
        att_a = ea / jnp.maximum(z[active_idx][:, :, None], 1e-30)
        att_n = en / jnp.maximum(z[newdet_idx][:, None, :], 1e-30)
        if keep < 1.0:
            att_a = att_a * ka / keep
            att_n = att_n * kn / keep
        rs = jnp.sum(att_a[..., None] * h_e_b, axis=2)   # [BT, na, H]
        cs = jnp.sum(att_n[..., None] * h_e_b, axis=1)   # [BT, nt, H]
        if wsc is not None:
            es = wsc(jnp.concatenate([rs, -cs], axis=1),
                     jnp.concatenate([act_l, new_l], axis=1))
        else:
            es = segment_sum(
                jnp.concatenate([rs.reshape(-1, H), -cs.reshape(-1, H)]),
                seg, nD, mask=vm)
        acc = es if acc is None else acc + es
    return acc / len(gat_params)


def _per_window_bce_dual(scores_d, t_d, mask_d, scores_e, t_e, mask_e, B):
    """Sum over windows of the window's masked-mean BCE across BOTH layouts
    (matches packed._per_window_bce on the union of det + edge rows).

    Detection arrays are window-major [B*capD]; edge arrays are STEP-MAJOR
    [P, na, nt] with P a multiple of B (block q belongs to window q mod B)."""
    pt_d = jnp.where(t_d == 1, scores_d, 1.0 - scores_d)
    pt_e = jnp.where(t_e == 1, scores_e, 1.0 - scores_e)
    le = jnp.where(mask_e, jnp.log(pt_e + EPS), 0.0)
    le = le.reshape(-1, B, le.shape[1] * le.shape[2])
    s = (jnp.sum(jnp.where(mask_d, jnp.log(pt_d + EPS), 0.0).reshape(B, -1), 1)
         + jnp.sum(le, axis=(0, 2)))
    c = (jnp.sum(mask_d.reshape(B, -1), 1)
         + jnp.sum(mask_e.reshape(-1, B, le.shape[2]), axis=(0, 2)))
    return -jnp.sum(s / jnp.maximum(c, 1.0))


def block_window_forward(params, batch_stats, cfg: mpnn.ModelConfig,
                         bb: BlockBatch, tp_classifier: bool,
                         train: bool = True, remat: bool = False,
                         compute_dtype=None, rng=None, fused: bool = False,
                         axis_name=None, defer_loss: bool = False,
                         gat_fused=None):
    """Scan the window in dual layout; same contract as packed_window_forward.

    remat=True wraps the scan body in jax.checkpoint: the step is bandwidth-
    bound on [B*T, na, nt, H] scan residuals (profiled: ~6 stacked copies of
    the edge array per round), so recomputing the round in backward trades
    cheap dense FLOPs for most of that HBM traffic.

    compute_dtype=jnp.bfloat16 carries the edge rectangles in bf16 and runs
    the GRU matmuls at bf16 MXU rate with f32 accumulation (losses, CE,
    logsumexp, BN and the output heads stay f32).  The f32 step profiles
    ~31% matmul time at ~22% MXU occupancy, so this is the measured next
    lever after the block reductions (CLAUDE.md perf log).

    rng: PRNG key for GAT attention dropout (required when training with
    cfg.nattheads > 0, like the packed path).

    fused=True routes the message-passing round through the fused Pallas
    kernel (ops/pallas_block.py): gate matmul, nonlinearities, masking and
    the row/col edge_support partials execute in VMEM, so the edge
    rectangle makes one HBM round trip per round instead of ~6.  GAT
    configs use the kernel for the edge GRU and keep the XLA attention
    aggregation; interpret mode is selected automatically off-TPU.

    axis_name: running under shard_map with windows split over that mesh
    axis (parallel/block_parallel.py).  BatchNorm moments and the
    step-validity gate psum across it so batch statistics and running-stat
    updates match the single-device cross-window semantics exactly; the
    loss/aux this returns stay LOCAL to the shard (the wrapper reduces).

    defer_loss=True attacks the dispatch floor (the residual cost of the
    fused step is ~70 small loss/CE/segment fusions PER SCAN ITERATION,
    tools/profile_block.py): the scan emits only per-step (h_d_out,
    raw edge logits) — the stacked logits are small, [T, B*T, na, nt] —
    and the whole loss side (targets + CE + BCE + F1) runs ONCE post-scan,
    vmapped over the step axis, so its fusions launch once on T×-bigger
    arrays instead of T times.  Numerics are identical (the per-step masks
    are recomputed from the step index, which is all they depend on)."""
    if train and cfg.nattheads > 0 and rng is None:
        raise ValueError("training with GAT heads needs an rng key for "
                         "attention dropout (pass rng=...)")
    # The fused round applies to GAT configs too: GAT only changes the node
    # aggregation (attention-weighted sums in _block_gat_support), not the
    # edge GRU the kernel computes; its rs/cs outputs just go unused there.
    use_fused = fused
    if use_fused and axis_name is not None \
            and jax.default_backend() != "tpu":
        # interpret-mode pallas cannot run under shard_map with
        # check_vma=True on this JAX version (even `x * 2.0` in a kernel
        # body fails the vma rule — framework limitation, minimal repro
        # in round-5 notes); off-TPU meshes keep the XLA round.  On real
        # TPU meshes the kernels run compiled with vma-annotated outputs
        # and explicit weight-cotangent psums (ops/pallas_block.py).
        use_fused = False
    # gat_fused=None follows use_fused; False keeps the fused round but
    # routes the attention aggregation through XLA (the fallback when the
    # stacked-head kernels fail to compile at some G/K/nh — seen at
    # nattheads=3, G=4, K=16 on this toolchain).  TM_GAT_XLA=1 forces it.
    if gat_fused is None:
        gat_fused = use_fused
    gat_fused = (gat_fused and cfg.nattheads > 0
                 and os.environ.get("TM_GAT_XLA", "") != "1")
    # The fused LOSS kernels are correct but measured SLOWER than the XLA
    # loss path (16.0 vs 14.2 ms/step: 3 extra kernel launches/step exceed
    # the ~3 ms of small fusions they replace; docs/RESULTS.md) - opt-in
    # for future mega-fusion work, never the default.
    use_fused_loss = (use_fused and not defer_loss
                      and os.environ.get("TM_FUSED_LOSS", "") == "1")
    # TM_HEAD_XLA=1: A/B knob — ignore the round kernel's edge-head logit
    # partials and recompute the head from h_e_out in XLA (re-reads the
    # H-wide rectangle; for measuring the head fusion's worth on-chip)
    head_fused = use_fused and os.environ.get("TM_HEAD_XLA", "") != "1"
    if use_fused:
        interp = jax.default_backend() != "tpu"
        from trackmpnn_tpu.ops.pallas_block import DEFAULT_G as PB_G
        from trackmpnn_tpu.ops.pallas_block import (fused_block_round,
                                                    fused_block_round_es,
                                                    window_gather2,
                                                    window_scatter)
        # under shard_map with check_vma=True every pallas out_shape must
        # declare its varying mesh axes (latent multi-chip+fused bug found
        # round 5: no sharded test had ever run fused=True)
        kvma = None
        if axis_name is not None:
            kvma = frozenset((axis_name,) if isinstance(axis_name, str)
                             else tuple(axis_name))
    # scatter-free round (round 5).  TM_ES_KERNEL modes, non-GAT only:
    #   "2" (default): composition — the round keeps the proven
    #       fused_block_round kernel, while the es edge_support reduction
    #       and the ga/gb gather-VJP scatters route through the standalone
    #       window_scatter/window_gather2 kernels (one-hot matmuls), which
    #       kills the ~30 serialized XLA scatter-adds (~1.2 ms of the
    #       6.54 ms step, logs/profile_block_r5.log);
    #   "1": integrated fused_block_round_es — forward compiles but its
    #       backward crashes tpu_compile_helper at every G on this
    #       toolchain (tools/debug_es_bwd_bisect.py); dev only;
    #   "0": plain XLA gather/segment_sum (the round-4 path).
    # Default is backend-dependent: "2" on TPU, "0" on CPU — running the
    # interpret-mode compose programs throughout the CPU suite tripped
    # XLA:CPU's order-dependent LLVM segfault (the same one that caps the
    # CPU TM_PREFIX_K default at 2); the dedicated parity tests set the
    # mode explicitly.
    es_default = "2" if jax.default_backend() == "tpu" else "0"
    es_mode = os.environ.get("TM_ES_KERNEL", es_default)
    use_es_kernel = (use_fused and cfg.nattheads == 0 and es_mode == "1")
    use_es_compose = (use_fused and cfg.nattheads == 0 and es_mode == "2")
    if use_fused_loss:
        from trackmpnn_tpu.ops.pallas_loss import DEFAULT_G as PL_G
        from trackmpnn_tpu.ops.pallas_loss import edge_losses
    B, T = bb.n_windows, bb.t_cap
    capD, na_cap, nt_cap = bb.capD, bb.na_cap, bb.nt_cap
    nD = B * capD
    H = cfg.nhidden
    nb = len(cfg.branches)
    det_window = jnp.arange(nD, dtype=jnp.int32) // capD

    # static-target build stays window-major (it needs blk_edge_base)
    row_m_w = jnp.arange(na_cap, dtype=jnp.int32)[None, :] < bb.blk_na[:, None]
    col_m_w = jnp.arange(nt_cap, dtype=jnp.int32)[None, :] < bb.blk_nt[:, None]
    st_w = build_static_targets(bb, row_m_w, col_m_w)

    # ---- step-major reorder: block q = s*B + w (round 4) ----
    # Blocks live at scan step s are exactly the first (s+1)*B, so the scan
    # runs in PREFIX SEGMENTS that never touch dead future blocks — killing
    # the triangular ~2x of masked work the window-major layout paid (at
    # step s only s+1 of T blocks per window were live).  The reorder is a
    # few small one-time gathers outside the scan; BlockBatch itself stays
    # window-major (host format + block_parallel's 'data' sharding).
    perm = jnp.arange(B * T, dtype=jnp.int32).reshape(B, T).T.reshape(-1)
    act_sm = bb.active_idx[perm]
    new_sm = bb.newdet_idx[perm]
    bna_sm = bb.blk_na[perm]
    bnt_sm = bb.blk_nt[perm]
    row_sm = row_m_w[perm]
    col_sm = col_m_w[perm]
    st_sm = StaticTargets(*(a[perm] for a in st_w))
    bw_full = jnp.arange(B * T, dtype=jnp.int32) % B   # block -> window
    bs_full = jnp.arange(B * T, dtype=jnp.int32) // B  # block -> step
    if use_fused_loss:
        # static per-batch arrays for the fused loss kernels
        lblm_sm = (bb.edge_label == 1).astype(jnp.float32)[perm]
        ebnt_sm = jnp.stack([bb.blk_edge_base.astype(jnp.float32),
                             bb.blk_nt.astype(jnp.float32)], axis=1)[perm]
        bna_f_sm = bb.blk_na.astype(jnp.float32)[perm][:, None]

    # prefix segments: steps [lo, hi) only ever see the first hi*B blocks.
    # K segments trade dead-block work (window-major did T^2; prefixes do
    # ~T^2*(K+1)/2K) against K traces/compiles of the scan body.  On-chip
    # the sweep is monotone in K at every G measured (logs/bench_gk_ab*.log:
    # K=1 12.04, K=4 8.50, K=8 8.44, K=16=T 6.70 ms at G=6/B=8/T=16), so
    # the TPU default is K=T (fully per-step-specialized segments, zero
    # dead blocks), capped at 16 to bound compile count for long windows.
    # TM_PREFIX_K=1 restores a single full-width scan (for A/B).  XLA:CPU
    # defaults to 2: its LLVM codegen has segfaulted mid-suite on wider
    # unrollings (multi-segment semantics — carry padding, per-segment
    # views, loss accumulation — are still covered at 2).
    k_env = os.environ.get("TM_PREFIX_K")
    if k_env is None:
        k_env = min(T, 16) if jax.default_backend() == "tpu" else 2
    n_seg = max(1, min(int(k_env), T))
    bounds = sorted({-(-T * (k + 1) // n_seg) for k in range(n_seg)})
    segs, _lo = [], 0
    for _hi in bounds:
        segs.append((_lo, _hi))
        _lo = _hi

    if use_fused:
        # window-local det ids for the kernels' one-hot gather/scatter
        # (global id = w*capD + local); f32 so the custom VJPs have float
        # cotangent slots.  Used by the es composition AND the GAT
        # edge_support scatter.
        act_l_sm = (act_sm % capD).astype(jnp.float32)
        new_l_sm = (new_sm % capD).astype(jnp.float32)

    def seg_view(P):
        return _SegView(
            act=act_sm[:P], new=new_sm[:P], bna=bna_sm[:P], bnt=bnt_sm[:P],
            row_m=row_sm[:P], col_m=col_sm[:P], bw=bw_full[:P],
            bs=bs_full[:P],
            st=StaticTargets(*(a[:P] for a in st_sm)),
            seg=jnp.concatenate([act_sm[:P].reshape(-1),
                                 new_sm[:P].reshape(-1)]),
            act_l=act_l_sm[:P] if use_fused else None,
            new_l=new_l_sm[:P] if use_fused else None,
        )

    # lin1 is step-independent: hoist it out of the scan (one tiny matmul)
    y1s, widths = [], []
    off = 0
    for bi, (_, width) in enumerate(cfg.branches):
        x = bb.det_feat[:, off : off + width]
        off += width
        y1s.append(nn.linear(params["branches"][bi]["input"]["lin1"], x))
        widths.append(width)

    # dispatch-floor companion to defer_loss: hoist the per-intro-step BN +
    # lin2 out of the scan (T in-scan launches + T redundant [nD, H] matmuls
    # -> one segment-reduction pass; TM_HOIST_BN=0 opts out for A/B)
    hoist_bn = defer_loss and os.environ.get("TM_HOIST_BN", "1") == "1"
    if hoist_bn:
        ids_c = jnp.minimum(bb.det_step, T - 1)
        det_isnew = (bb.det_step < T) & bb.step_valid[ids_c, det_window]
        blk_isnew = bb.step_valid[bs_full, bw_full]
        nph_T = segment_sum((bna_sm * bnt_sm).astype(jnp.float32),
                            bs_full, T, mask=blk_isnew)
        xts_h, stats_fin_h = [], []
        for bi in range(nb):
            bp = params["branches"][bi]
            yb, new_bs = _hoisted_bn_all_steps(
                bp["input"], batch_stats["branches"][bi]["bn"], y1s[bi],
                ids_c, det_isnew, nph_T, T, train, axis_name)
            xts_h.append(nn.linear(bp["input"]["lin2"], jax.nn.relu(yb)))
            stats_fin_h.append({"bn": new_bs})
        stats_fin_h = {"branches": stats_fin_h}

    h_d0 = jnp.zeros((nD, nb * H), jnp.float32)
    if axis_name is not None:
        # under shard_map the hidden carries are shard-varying from round 1;
        # mark the (constant-zero) initials so the scan carry types agree
        h_d0 = jax.lax.pcast(h_d0, (axis_name,), to="varying")

    def live_masks(s, v):
        """Everything the loss side needs is a function of the step index."""
        sv = bb.step_valid[s]                       # [B]
        any_valid = jnp.any(sv)
        if axis_name is not None:
            # stats gating must agree across shards or replication breaks
            any_valid = jax.lax.psum(any_valid.astype(jnp.int32),
                                     axis_name) > 0
        det_valid = sv[det_window]
        det_live = (bb.det_step <= s) & det_valid
        blk_valid = sv[v.bw]
        blk_live = (v.bs <= s) & blk_valid & (v.bnt > 0)
        em3 = blk_live[:, None, None] & v.row_m[:, :, None] & v.col_m[:, None, :]
        return any_valid, det_valid, det_live, blk_valid, blk_live, em3

    def step_losses(logits_d, logits_e, det_live, blk_live, em3, v):
        """Targets + CE + BCE + F1 for one step from MASKED logits; shared by
        the in-scan path and the deferred (vmapped-over-steps) path."""
        t_d, t_e, l_ce = _block_targets_and_ce(
            logits_d, logits_e, bb.det_label, v.act, v.bna, v.bnt, v.st,
            det_live, blk_live, v.row_m, v.col_m, em3)
        scores_d = jnp.where(det_live, jax.nn.sigmoid(logits_d), 0.0)
        scores_e = jnp.where(em3, jax.nn.sigmoid(logits_e), 0.0)
        no_mask_d = jnp.zeros_like(det_live)
        if tp_classifier:
            l_f = (_per_window_bce_dual(scores_d, t_d, det_live, scores_e,
                                        t_e, jnp.zeros_like(em3), B)
                   + _per_window_bce_dual(scores_d, t_d, no_mask_d,
                                          scores_e, t_e, em3, B))
            md = det_live
        else:
            l_f = _per_window_bce_dual(scores_d, t_d, no_mask_d, scores_e,
                                       t_e, em3, B)
            md = no_mask_d
        pred_d, pred_e = scores_d >= 0.5, scores_e >= 0.5
        me = em3
        tp = (jnp.sum(md & pred_d & (t_d == 1))
              + jnp.sum(me & pred_e & (t_e == 1)))
        fp = (jnp.sum(md & pred_d & (t_d != 1))
              + jnp.sum(me & pred_e & (t_e != 1)))
        fn = (jnp.sum(md & ~pred_d & (t_d == 1))
              + jnp.sum(me & ~pred_e & (t_e == 1)))
        return l_ce, l_f, tp, fp, fn

    def make_step(v):
      P = v.act.shape[0]

      def step(carry, s):
        h_d, h_e, stats = carry
        any_valid, det_valid, det_live, blk_valid, blk_live, em3 = \
            live_masks(s, v)
        det_new = (bb.det_step == s) & det_valid
        blk_new = (v.bs == s) & blk_valid
        act_m1 = (blk_live[:, None] & v.row_m).reshape(-1)
        vm = jnp.concatenate([act_m1,
                              (blk_live[:, None] & v.col_m).reshape(-1)])
        m3 = em3.astype(jnp.float32) if use_fused else None
        rng_s = jax.random.fold_in(rng, s) if rng is not None else None

        n_phantom = (None if hoist_bn else
                     jnp.sum(jnp.where(blk_new, v.bna * v.bnt, 0)))

        hd_parts, he_parts, lg_parts, stats_new = [], [], [], []
        for bi in range(nb):
            bp = params["branches"][bi]
            bs = stats["branches"][bi]["bn"]
            if hoist_bn:
                # BN + lin2 precomputed for every step outside the scan;
                # running stats resolved there too (closed-form EMA fold)
                xt = xts_h[bi]
                stats_new.append({"bn": bs})
            else:
                xt, bn_stats, cnt_raw = _bn_with_phantom_rows(
                    bp["input"], bs, y1s[bi], det_new, n_phantom, train=train,
                    axis_name=axis_name)
                xt = nn.linear(bp["input"]["lin2"], jax.nn.relu(xt))
                bn_stats = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(cnt_raw > 0, a, b), bn_stats, bs)
                stats_new.append({"bn": bn_stats})

            h_d_b = h_d[:, bi * H : (bi + 1) * H]
            h_d_b = jnp.where(det_new[:, None], xt,
                              jnp.where(det_live[:, None], h_d_b, 0.0))
            h_e_sl = h_e[..., bi * H : (bi + 1) * H]

            # -------- message-passing round, dual layout --------
            eg = bp["edge_gru"]
            if use_fused:
                # The edge-GRU input matmul factorizes over the bipartite
                # rectangle: x[i,j] = h[act_i] -/|| h[new_j], so
                # gi[i,j] = ga[act_i] +/- gb[new_j] + b_ih with ga/gb
                # computed ONCE on the compact detection layout; the
                # rectangle broadcast, masking, gates, output and the rs/cs
                # edge_support partials all execute in VMEM inside the
                # fused kernel -- one HBM round trip per round.
                if cfg.msg_type == "concat":
                    ga_d = nn.matmul_lp(h_d_b, eg["w_ih"][:H], compute_dtype)
                    gb_d = nn.matmul_lp(h_d_b, eg["w_ih"][H:], compute_dtype)
                    sgn = 1.0
                else:
                    ga_d = gb_d = nn.matmul_lp(h_d_b, eg["w_ih"],
                                               compute_dtype)
                    sgn = -1.0
                stream_bf16 = (compute_dtype is not None
                               and os.environ.get("TM_GAB_F32", "") != "1")
                w_eb = params["out_edge"]["w"][bi * H:(bi + 1) * H]
                if use_es_kernel:
                    # scatter-free round: the act/new gather AND the es
                    # edge_support reduction happen inside the kernel via
                    # per-window one-hot matmuls (no XLA scatter/gather)
                    if stream_bf16:
                        shared = gb_d is ga_d
                        ga_d = ga_d.astype(compute_dtype)
                        gb_d = ga_d if shared else gb_d.astype(compute_dtype)
                    edge_out, lg, es_k = fused_block_round_es(
                        h_e_sl, v.act_l, v.new_l, ga_d, gb_d, eg["b_ih"],
                        eg["w_hh"], eg["b_hh"], w_eb, m3, sgn,
                        compute_dtype, B, capD, PB_G, interp)
                else:
                    if use_es_compose:
                        # cheap XLA gather fwd, window_scatter-kernel VJP
                        ga_g, gb = window_gather2(ga_d, gb_d, v.act_l,
                                                  v.new_l, B, capD, PB_G,
                                                  interp, kvma)
                        ga = ga_g + eg["b_ih"]
                    else:
                        ga = ga_d[v.act] + eg["b_ih"]
                        gb = gb_d[v.new]
                    if stream_bf16:
                        # stream the input gates at half the HBM bytes; the
                        # kernel computes in f32 and astype's VJP casts the
                        # bf16 dga/dgb back to f32 before upstream
                        # reductions
                        ga = ga.astype(compute_dtype)
                        gb = gb.astype(compute_dtype)
                    edge_out, rs, cs, lg = fused_block_round(
                        h_e_sl, ga, gb, eg["w_hh"], eg["b_hh"], w_eb, m3,
                        sgn, compute_dtype, PB_G, interp, kvma)
                lg_parts.append(lg)
            else:
                # XLA fallback keeps the ns-matmul formulation: on-chip the
                # bf16 rectangle matmul + fused epilogue beats an f32
                # broadcast-gate chain (measured 28.1 vs 34.9 ms/step)
                h_e_b = jnp.where(em3[..., None], h_e_sl,
                                  jnp.zeros((), h_e.dtype))
                ha = h_d_b[v.act]                       # [P, na, H]
                hn = h_d_b[v.new]                       # [P, nt, H]
                if cfg.msg_type == "concat":
                    ns = jnp.concatenate([
                        jnp.broadcast_to(ha[:, :, None, :], em3.shape + (H,)),
                        jnp.broadcast_to(hn[:, None, :, :], em3.shape + (H,)),
                    ], axis=-1)
                else:
                    ns = ha[:, :, None, :] - hn[:, None, :, :]
                ns = jnp.where(em3[..., None], ns, 0.0)
                edge_out = nn.gru_cell(
                    eg, ns.reshape(-1, ns.shape[-1]),
                    h_e_b.reshape(-1, H),
                    dtype=compute_dtype).reshape(em3.shape + (H,))
                edge_out = jnp.where(em3[..., None], edge_out, 0.0)

            if cfg.nattheads > 0:
                rng_sb = (jax.random.fold_in(rng_s, bi)
                          if rng_s is not None else None)
                # attention weights are zero at padded entries, so the raw
                # rectangle is safe when the fused round skipped the mask
                h_e_att = h_e_sl if use_fused else h_e_b
                # fused rounds route the GAT edge_support reduction
                # through the window_scatter kernel too (TM_GAT_WS=0
                # opts out; the m_d segment-MAX stays XLA — the kernel
                # only sums)
                wsc = None
                if use_fused and os.environ.get("TM_GAT_WS", "1") == "1":
                    wsc = (lambda vals, idx: window_scatter(
                        vals, idx, B, capD, PB_G, interp, kvma))
                es = _block_gat_support(bp["gat"], h_d_b, h_e_att, v.act,
                                        v.new, em3, v.seg, vm, nD, rng_sb,
                                        train, fused=gat_fused, m3=m3,
                                        interp=interp if gat_fused else False,
                                        wsc=wsc, act_l=v.act_l,
                                        new_l=v.new_l)
            elif use_es_kernel:
                es = es_k  # already reduced to det layout inside the kernel
            elif use_es_compose:
                # one window_scatter launch replaces the serialized
                # XLA scatter-add (rows scatter +, new-det cols -)
                es = window_scatter(
                    jnp.concatenate([rs, -cs], axis=1),
                    jnp.concatenate([v.act_l, v.new_l], axis=1),
                    B, capD, PB_G, interp, kvma)
            else:
                if not use_fused:
                    # edge_support partials: +rows to active, -cols to new
                    rs = jnp.sum(h_e_b, axis=2)
                    cs = jnp.sum(h_e_b, axis=1)
                vals = jnp.concatenate([rs.reshape(-1, H), -cs.reshape(-1, H)])
                es = segment_sum(vals, v.seg, nD, mask=vm)
            node_out = nn.gru_cell(bp["node_gru"], es, h_d_b,
                                   dtype=compute_dtype)
            hd_parts.append(jnp.where(det_live[:, None], node_out, 0.0))
            he_parts.append(edge_out)
        stats_new = {"branches": stats_new}

        h_d_out = jnp.concatenate(hd_parts, axis=-1)
        h_e_out = jnp.concatenate(he_parts, axis=-1)

        if defer_loss:
            # emit raw per-step logits; the whole loss side runs post-scan,
            # vmapped over steps (one launch per fusion instead of T)
            if head_fused:
                logits_e_raw = sum(lg_parts) + params["out_edge"]["b"][0]
            else:
                logits_e_raw = nn.linear(params["out_edge"], h_e_out)[..., 0]
            h_d_next = jnp.where(det_valid[:, None], h_d_out, h_d)
            h_e_next = jnp.where(blk_valid[:, None, None, None], h_e_out,
                                 h_e.astype(h_e_out.dtype)).astype(h_e.dtype)
            stats_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(any_valid, a, b), stats_new, stats)
            # hd_parts were already det_live-masked above
            return (h_d_next, h_e_next, stats_next), (h_d_out, logits_e_raw)

        logits_d = nn.linear(params["out_node"], h_d_out)[:, 0]
        logits_d = jnp.where(det_live, logits_d, 0.0)

        if use_fused_loss:
            # edge head + targets + CE + BCE + F1 in the fused loss kernels
            # (ops/pallas_loss.py); the detection side stays XLA (nD-sized)
            partials = edge_losses(
                h_e_out, params["out_edge"]["w"],
                params["out_edge"]["b"].reshape(1, 1), lblm_sm[:P], m3,
                ebnt_sm[:P], bna_f_sm[:P], v.act, act_m1, nD, PL_G, interp)
            l_ce = jnp.sum(partials[:, 0] + partials[:, 1])
            t_d = ((bb.det_label == 1) & det_live).astype(jnp.int32)
            scores_d = jnp.where(det_live, jax.nn.sigmoid(logits_d), 0.0)
            # step-major: block q belongs to window q mod B
            e_sum = jnp.sum(partials[:, 2].reshape(-1, B), axis=0)
            e_cnt = jnp.sum(partials[:, 3].reshape(-1, B), axis=0)
            l_f = -jnp.sum(e_sum / jnp.maximum(e_cnt, 1.0))
            tp = jnp.sum(partials[:, 4]).astype(jnp.int32)
            fp = jnp.sum(partials[:, 5]).astype(jnp.int32)
            fn = jnp.sum(partials[:, 6]).astype(jnp.int32)
            if tp_classifier:
                pt_d = jnp.where(t_d == 1, scores_d, 1.0 - scores_d)
                lp_d = jnp.where(det_live, jnp.log(pt_d + EPS), 0.0)
                s_dw = jnp.sum(lp_d.reshape(B, -1), axis=1)
                c_dw = jnp.sum(det_live.reshape(B, -1), axis=1)
                l_f = l_f - jnp.sum(s_dw / jnp.maximum(c_dw, 1.0))
                pred_d = scores_d >= 0.5
                tp = tp + jnp.sum(det_live & pred_d & (t_d == 1))
                fp = fp + jnp.sum(det_live & pred_d & (t_d != 1))
                fn = fn + jnp.sum(det_live & ~pred_d & (t_d == 1))
        else:
            if head_fused:
                # head partials came out of the round kernel per branch
                logits_e = jnp.where(
                    em3, sum(lg_parts) + params["out_edge"]["b"][0], 0.0)
            else:
                logits_e = nn.linear(params["out_edge"], h_e_out)[..., 0]
                logits_e = jnp.where(em3, logits_e, 0.0)

            l_ce, l_f, tp, fp, fn = step_losses(logits_d, logits_e,
                                                det_live, blk_live, em3, v)

        h_d_next = jnp.where(det_valid[:, None], h_d_out, h_d)
        h_e_next = jnp.where(blk_valid[:, None, None, None], h_e_out,
                             h_e.astype(h_e_out.dtype)).astype(h_e.dtype)
        stats_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(any_valid, a, b), stats_new, stats)
        zero = jnp.float32(0.0)
        return (h_d_next, h_e_next, stats_next), (
            jnp.where(any_valid, l_ce, zero), jnp.where(any_valid, l_f, zero),
            tp, fp, fn)

      return step

    # ---- run the prefix segments ----
    h_d, h_e, stats = h_d0, None, batch_stats
    seg_outs = []
    for lo, hi in segs:
        P = hi * B
        v = seg_view(P)
        if h_e is None:
            h_e = jnp.zeros((P, na_cap, nt_cap, nb * H),
                            compute_dtype or jnp.float32)
            if axis_name is not None:
                h_e = jax.lax.pcast(h_e, (axis_name,), to="varying")
        elif P > h_e.shape[0]:
            # new blocks enter with zero hidden state: pad the carry
            h_e = jnp.pad(h_e, ((0, P - h_e.shape[0]), (0, 0), (0, 0),
                                (0, 0)))
        body = make_step(v)
        body = jax.checkpoint(body) if remat else body
        (h_d, h_e, stats), out = jax.lax.scan(
            body, (h_d, h_e, stats), jnp.arange(lo, hi))
        seg_outs.append((lo, hi, v, out))
    h_d_fin, stats_fin = h_d, stats
    # hand back the final edge hidden in the window-major block order the
    # BlockBatch uses (one small gather, outside the hot loop)
    iperm = jnp.arange(B * T, dtype=jnp.int32).reshape(T, B).T.reshape(-1)
    h_e_fin = h_e[iperm]

    zero = jnp.float32(0.0)
    l_ce = l_f = zero
    tp = fp = fn = jnp.int32(0)
    if defer_loss:
        # MERGED deferred loss (round-5 experiment, opt-in TM_MERGED_LOSS=1):
        # pad each segment's edge logits to the full B*T block axis and run
        # ONE vmapped loss pass over all T steps — numerically identical to
        # the per-segment form (dead blocks are masked by blk_live), and it
        # collapses the Kx duplication of every loss fusion.  MEASURED
        # SLOWER on-chip (7.02 vs 6.54 ms at B=8, logs/bench_merged_loss.log):
        # the merged pass computes every step at full B*T width while the
        # per-segment pass runs step s at its true prefix width (s+1)*B, and
        # that ~2x masked elementwise work costs more than the launch
        # savings.  Default stays per-segment.
        merged = os.environ.get("TM_MERGED_LOSS", "") == "1"

        def loss_at(s, logits_d, logits_e, v):
            any_valid, _, det_live, _, blk_live, em3 = live_masks(s, v)
            logits_d = jnp.where(det_live, logits_d, 0.0)
            logits_e = jnp.where(em3, logits_e.astype(jnp.float32), 0.0)
            a, b, c, d, e = step_losses(logits_d, logits_e, det_live,
                                        blk_live, em3, v)
            return (jnp.where(any_valid, a, zero),
                    jnp.where(any_valid, b, zero), c, d, e)

        if merged:
            v_full = seg_view(B * T)
            hd_all = jnp.concatenate([hd_k for _, _, _, (hd_k, _) in seg_outs])
            le_all = jnp.concatenate([
                jnp.pad(le_k, ((0, 0), (0, B * T - le_k.shape[1]), (0, 0),
                               (0, 0)))
                for _, _, _, (_, le_k) in seg_outs])
            ld_all = nn.linear(params["out_node"], hd_all)[..., 0]  # [T, nD]
            lc_k, lf_k, tp_k, fp_k, fn_k = jax.vmap(
                lambda s, d, e: loss_at(s, d, e, v_full))(
                    jnp.arange(T), ld_all, le_all)
            l_ce, l_f = jnp.sum(lc_k), jnp.sum(lf_k)
            tp, fp, fn = jnp.sum(tp_k), jnp.sum(fp_k), jnp.sum(fn_k)
        else:
            for lo, hi, v, (hd_k, le_k) in seg_outs:
                # one batched head matmul over the segment's steps, then the
                # loss side vmapped over the step axis: every fusion launches
                # once per segment on [T_k, ...] arrays instead of T times
                ld_k = nn.linear(params["out_node"], hd_k)[..., 0]  # [T_k, nD]
                lc_k, lf_k, tp_k, fp_k, fn_k = jax.vmap(
                    lambda s, d, e, v=v: loss_at(s, d, e, v))(
                        jnp.arange(lo, hi), ld_k, le_k)
                l_ce = l_ce + jnp.sum(lc_k)
                l_f = l_f + jnp.sum(lf_k)
                tp = tp + jnp.sum(tp_k)
                fp = fp + jnp.sum(fp_k)
                fn = fn + jnp.sum(fn_k)
    else:
        for lo, hi, v, (lc_k, lf_k, tp_k, fp_k, fn_k) in seg_outs:
            l_ce = l_ce + jnp.sum(lc_k)
            l_f = l_f + jnp.sum(lf_k)
            tp = tp + jnp.sum(tp_k)
            fp = fp + jnp.sum(fp_k)
            fn = fn + jnp.sum(fn_k)
    total = (l_ce + l_f) / B
    aux = {
        "loss_ce": l_ce / B, "loss_f": l_f / B,
        "tp": tp, "fp": fp, "fn": fn,
        "batch_stats": stats_fin_h if hoist_bn else stats_fin,
        "hidden": (h_d_fin, h_e_fin),
    }
    return total, aux


def make_block_train_step(cfg: mpnn.ModelConfig, tx, tp_classifier: bool,
                          remat=None, compute_dtype=None,
                          fused: bool = False, defer_loss: bool = False,
                          gat_fused=None, gat_fallback: bool = True):
    """jit'd full train step over a BlockBatch (drop-in for the packed one).

    remat=None resolves per path (measured on v5e, B=8/cap=4096):
      * XLA round -> True: dropping ~6 stacked [T, B*T, na, nt, H] scan
        residuals cuts the step 49.3 -> 38.4 ms (the recompute is cheap);
      * fused round -> False: the kernel leaves nothing big to stack (its
        VJP re-derives the gates from the inputs), so remat only re-runs
        the kernel for residuals that are cheap to stream (16.8 -> 14.2 ms
        without it).
    compute_dtype: see block_window_forward (bf16 rectangles + matmuls).

    gat_fused/gat_fallback: the stacked-head GAT kernels fail to COMPILE at
    some (nattheads, G, K) points on this toolchain (tpu_compile_helper
    crash at nh=3, G=4, K=16 — not a VMEM OOM, logs/bench_r4_gat_g4.log).
    With gat_fallback=True (default) the first invocation is probed: a
    JaxRuntimeError rebuilds the step with gat_fused=False (XLA attention,
    fused round kept) so no flag combination crashes the CLI."""
    if remat is None:
        remat = not fused

    def build(gf):
        def loss_fn(params, batch_stats, bb, rng):
            return block_window_forward(params, batch_stats, cfg, bb,
                                        tp_classifier, remat=remat,
                                        compute_dtype=compute_dtype, rng=rng,
                                        fused=fused, defer_loss=defer_loss,
                                        gat_fused=gf)

        @jax.jit
        def step(params, batch_stats, opt_state, bb: BlockBatch, rng=None):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, bb, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, aux["batch_stats"], opt_state, loss, {
                k: aux[k] for k in ("loss_ce", "loss_f", "tp", "fp", "fn")
            }

        return step

    step = build(gat_fused)
    if os.environ.get("TM_GAT_FALLBACK", "") == "0":  # A/B: fail loudly
        gat_fallback = False
    if not (gat_fallback and fused and cfg.nattheads > 0
            and gat_fused is not False):
        return step

    chosen = []

    def step_with_fallback(*a, **kw):
        if chosen:
            return chosen[0](*a, **kw)
        try:
            out = step(*a, **kw)
            jax.block_until_ready(out[3])  # surface compile/run errors NOW
            chosen.append(step)
            return out
        except jax.errors.JaxRuntimeError as e:
            import warnings

            warnings.warn(
                "fused GAT kernels failed to compile at this config "
                f"({type(e).__name__}); falling back to XLA attention "
                "(fused round kept). Set TM_GAT_XLA=1 to skip the probe.")
            fb = build(False)
            chosen.append(fb)
            return fb(*a, **kw)

    return step_with_fallback
