"""Fused edge-loss kernels == pure-XLA oracle (partials and VJP).

The strongest pin is the full-step fused-vs-XLA parity in
tests/test_block_step.py; these tests isolate the kernel module with a
local oracle so failures localize, and cover bf16 carries + BT padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.losses.losses import EPS
from trackmpnn_tpu.ops.pallas_loss import BIG, edge_losses
from trackmpnn_tpu.ops.segment import segment_min, segment_sum, segment_max


def oracle(h_eo, w_e, b_e, lbl, m3, ebnt, bna, active_idx, act_m, nD):
    """Plain-XLA restatement of the fused pipeline's contract."""
    BT, na, nt, K = h_eo.shape
    mb = m3 > 0.5
    logits = (h_eo.astype(jnp.float32) @ w_e)[..., 0] + b_e[0, 0]
    logits = jnp.where(mb, logits, 0.0)
    lblb = (lbl * m3) > 0.5
    ii = jnp.arange(na, dtype=jnp.float32)[None, :, None]
    jj = jnp.arange(nt, dtype=jnp.float32)[None, None, :]
    rowid = ebnt[:, 0][:, None, None] + ii * ebnt[:, 1][:, None, None] + jj

    r_min = jnp.min(jnp.where(lblb, rowid, BIG), axis=2)
    sel1 = segment_min(r_min.reshape(-1), active_idx.reshape(-1), nD,
                       mask=act_m)
    max_i = jnp.max(jnp.where(lblb, ii, -1.0), axis=1)
    part_a = lblb & (ii == max_i[:, None, :])
    part_b = lblb & (rowid == sel1[active_idx][:, :, None])
    tpos = part_a | part_b

    neg = -1e30
    lm = jnp.where(mb, logits, neg)
    m_col = jnp.max(lm, axis=1)
    safe_c = jnp.where(m_col > neg / 2, m_col, 0.0)
    s_col = jnp.sum(jnp.where(mb, jnp.exp(logits - safe_c[:, None, :]), 0.0), axis=1)
    lse_col = safe_c + jnp.log(jnp.maximum(s_col, 1e-30))
    col_has = jnp.any(tpos, axis=1)
    sel_i = jnp.max(jnp.where(tpos, ii, -1.0), axis=1)
    sel_logit = jnp.sum(jnp.where(tpos & (ii == sel_i[:, None, :]), logits, 0.0), axis=1)
    ce_past = jnp.sum(jnp.where(col_has, (lse_col - sel_logit)
                                / jnp.maximum(bna[:, 0], 1.0)[:, None], 0.0), axis=1)

    row_live = m3[:, :, 0] > 0.5
    m_r = jnp.max(lm, axis=2)
    safe_r = jnp.where(m_r > neg / 2, m_r, 0.0)
    s_r = jnp.sum(jnp.where(mb, jnp.exp(logits - safe_r[:, :, None]), 0.0), axis=2)
    flat = active_idx.reshape(-1)
    m_star = segment_max(m_r.reshape(-1), flat, nD, mask=act_m)
    safe_star = jnp.where(m_star > neg / 2, m_star, 0.0)
    s_tot = segment_sum(
        s_r.reshape(-1) * jnp.exp(jnp.minimum(
            m_r.reshape(-1) - safe_star[jnp.clip(flat, 0, nD - 1)], 0.0)),
        flat, nD, mask=act_m)
    cnt_row = jnp.where(row_live, ebnt[:, 1][:, None], 0.0)
    size_d = segment_sum(cnt_row.reshape(-1), flat, nD, mask=act_m)
    lse_d = jnp.where(size_d > 0.5,
                      safe_star + jnp.log(jnp.maximum(s_tot, 1e-30)), 0.0)
    lsed = lse_d[active_idx][:, :, None]
    sized = jnp.maximum(size_d[active_idx][:, :, None], 1.0)
    ce_fut = jnp.sum(jnp.where(part_b, (lsed - logits) / sized, 0.0), axis=(1, 2))

    s = jax.nn.sigmoid(logits)
    pt = jnp.where(tpos, s, 1.0 - s)
    bce = jnp.sum(jnp.where(mb, jnp.log(pt + EPS), 0.0), axis=(1, 2))
    cnt = jnp.sum(m3, axis=(1, 2))
    pred = (s >= 0.5) & mb
    tp = jnp.sum(jnp.where(pred & tpos, 1.0, 0.0), axis=(1, 2))
    fp = jnp.sum(jnp.where(pred & ~tpos, 1.0, 0.0), axis=(1, 2))
    fn = jnp.sum(jnp.where(mb & ~pred & tpos, 1.0, 0.0), axis=(1, 2))
    return jnp.stack([ce_past, ce_fut, bce, cnt, tp, fp, fn,
                      jnp.zeros_like(tp)], axis=1)


def make_inputs(rng, BT=11, na=8, nt=8, K=16, capD=32, B=1,
                dtype=jnp.float32):
    nD = B * capD
    h_eo = (rng.normal(size=(BT, na, nt, K)) * 0.5).astype(np.float32)
    w_e = (rng.normal(size=(K, 1)) * 0.3).astype(np.float32)
    b_e = np.full((1, 1), -1.0, np.float32)
    blk_na = rng.integers(0, na + 1, size=BT)
    blk_nt = rng.integers(0, nt + 1, size=BT)
    m3 = ((np.arange(na)[None, :, None] < blk_na[:, None, None])
          & (np.arange(nt)[None, None, :] < blk_nt[:, None, None])
          ).astype(np.float32)
    lbl = (rng.random((BT, na, nt)) < 0.25).astype(np.float32) * m3
    eb = np.cumsum(blk_na * blk_nt) - blk_na * blk_nt
    ebnt = np.stack([eb, blk_nt], axis=1).astype(np.float32)
    bna = blk_na[:, None].astype(np.float32)
    active_idx = rng.integers(0, nD, size=(BT, na)).astype(np.int32)
    act_m = (m3[:, :, 0] > 0.5).reshape(-1)
    return (jnp.asarray(h_eo).astype(dtype), jnp.asarray(w_e),
            jnp.asarray(b_e), jnp.asarray(lbl), jnp.asarray(m3),
            jnp.asarray(ebnt), jnp.asarray(bna), jnp.asarray(active_idx),
            jnp.asarray(act_m), nD)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_edge_losses_forward(dtype):
    rng = np.random.default_rng(0)
    args = make_inputs(rng, dtype=dtype)
    got = edge_losses(*args, 4, True)
    want = oracle(*args)
    tol = dict(rtol=3e-2, atol=3e-2) if dtype == jnp.bfloat16 else \
        dict(rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **tol)


def test_edge_losses_grads():
    rng = np.random.default_rng(1)
    args = make_inputs(rng, BT=9)
    w = jax.random.normal(jax.random.key(0), (args[0].shape[0], 8))
    w = w.at[:, 3:7].set(0.0)  # counts are non-differentiable outputs

    def scalar(f):
        def g(h_eo, w_e, b_e):
            return jnp.sum(f(h_eo, w_e, b_e, *args[3:]) * w)
        return g

    fused = lambda *a: edge_losses(*a, 4, True)
    oracle10 = lambda *a: oracle(*a)
    g_f = jax.grad(scalar(fused), argnums=(0, 1, 2))(*args[:3])
    g_o = jax.grad(scalar(oracle10), argnums=(0, 1, 2))(*args[:3])
    for a, b, name in zip(g_f, g_o, ["dheo", "dwe", "dbe"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
