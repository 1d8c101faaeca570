"""Fused GAT score kernel == XLA oracle (values and VJP), interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.ops.pallas_gat import gat_scores, reference_gat_scores

ALPHA = 0.2


def make_inputs(rng, BT=11, na=8, nt=8, H=16):
    ha = rng.normal(size=(BT, na, H)).astype(np.float32)
    hn = rng.normal(size=(BT, nt, H)).astype(np.float32)
    a = (rng.normal(size=(H, 1)) * 0.5).astype(np.float32)
    blk_na = rng.integers(0, na + 1, size=BT)
    blk_nt = rng.integers(0, nt + 1, size=BT)
    m = ((np.arange(na)[None, :, None] < blk_na[:, None, None])
         & (np.arange(nt)[None, None, :] < blk_nt[:, None, None])
         ).astype(np.float32)
    return (jnp.asarray(ha), jnp.asarray(hn), jnp.asarray(a), jnp.asarray(m))


def test_gat_scores_forward():
    rng = np.random.default_rng(0)
    args = make_inputs(rng)
    got = gat_scores(*args, ALPHA, 4, True)
    want = reference_gat_scores(*args, ALPHA)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(got)[np.asarray(args[3]) == 0] == 0)


def test_gat_scores_grads():
    rng = np.random.default_rng(1)
    ha, hn, a, m = make_inputs(rng, BT=7)
    w = jax.random.normal(jax.random.key(0), m.shape) * jnp.asarray(m)

    def scalar(f):
        return lambda ha, hn, a: jnp.sum(f(ha, hn, a, m) * w)

    fused = lambda ha, hn, a, m_: gat_scores(ha, hn, a, m_, ALPHA, 4, True)
    ref = lambda ha, hn, a, m_: reference_gat_scores(ha, hn, a, m_, ALPHA)
    g_f = jax.grad(scalar(fused), argnums=(0, 1, 2))(ha, hn, a)
    g_r = jax.grad(scalar(ref), argnums=(0, 1, 2))(ha, hn, a)
    for x, y, name in zip(g_f, g_r, ["dha", "dhn", "da"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


# ---------------------------------------------------------- round-3 kernels --
def test_gat_scores_stats_forward():
    rng = np.random.default_rng(2)
    ha, hn, a, m = make_inputs(rng, BT=9)
    e, rmax, cmax, sal, sbl = jax.jit(
        lambda *xs: __import__("trackmpnn_tpu.ops.pallas_gat",
                               fromlist=["gat_scores_stats"]
                               ).gat_scores_stats(*xs, ALPHA, 4, True)
    )(ha, hn, a, m)
    want_e = reference_gat_scores(ha, hn, a, m, ALPHA)
    np.testing.assert_allclose(np.asarray(e), np.asarray(want_e),
                               rtol=1e-5, atol=1e-6)
    from trackmpnn_tpu.ops.pallas_gat import NEG_SCORE

    e_m = np.where(np.asarray(m) > 0, np.asarray(want_e), NEG_SCORE)
    np.testing.assert_allclose(np.asarray(rmax), e_m.max(2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cmax), e_m.max(1), rtol=1e-6)
    want_sal = (np.asarray(m) * np.exp(e_m - e_m.max(2, keepdims=True))).sum(2)
    want_sbl = (np.asarray(m) * np.exp(e_m - e_m.max(1, keepdims=True))).sum(1)
    np.testing.assert_allclose(np.asarray(sal), want_sal, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sbl), want_sbl, rtol=1e-5, atol=1e-6)


def test_gat_scores_stats_grads():
    """Grads of (e, sa, sb) — where sa/sb are the assembled global pieces
    exp(rmax - 0)*sa_l with rmax stop-grad'd — must match XLA autodiff of
    the direct formulation sum m3*exp(e)."""
    from trackmpnn_tpu.ops.pallas_gat import gat_scores_stats

    rng = np.random.default_rng(3)
    ha, hn, a, m = make_inputs(rng, BT=6)
    we = jax.random.normal(jax.random.key(1), m.shape) * jnp.asarray(m)
    na, nt = m.shape[1], m.shape[2]
    wa = jax.random.normal(jax.random.key(2), (m.shape[0], na))
    wb = jax.random.normal(jax.random.key(3), (m.shape[0], nt))

    def fused(ha, hn, a):
        e, rmax, cmax, sal, sbl = gat_scores_stats(ha, hn, a, m, ALPHA, 4,
                                                   True)
        rmax = jax.lax.stop_gradient(rmax)
        cmax = jax.lax.stop_gradient(cmax)
        sa = jnp.exp(rmax) * sal        # global m = 0 for the test
        sb = jnp.exp(cmax) * sbl
        return jnp.sum(e * we) + jnp.sum(sa * wa) + jnp.sum(sb * wb)

    def ref(ha, hn, a):
        e = reference_gat_scores(ha, hn, a, m, ALPHA)
        sa = jnp.sum(m * jnp.exp(jnp.where(m > 0, e, -jnp.inf)), axis=2)
        sb = jnp.sum(m * jnp.exp(jnp.where(m > 0, e, -jnp.inf)), axis=1)
        return jnp.sum(e * we) + jnp.sum(sa * wa) + jnp.sum(sb * wb)

    np.testing.assert_allclose(float(fused(ha, hn, a)), float(ref(ha, hn, a)),
                               rtol=1e-5)
    g_f = jax.grad(fused, argnums=(0, 1, 2))(ha, hn, a)
    g_r = jax.grad(ref, argnums=(0, 1, 2))(ha, hn, a)
    for x, y, name in zip(g_f, g_r, ["dha", "dhn", "da"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def _agg_inputs(rng, BT=7, na=8, nt=8, H=16, dropout=False):
    e = rng.normal(size=(BT, na, nt)).astype(np.float32)
    m = (rng.random((BT, na, nt)) > 0.3).astype(np.float32)
    m_row = rng.normal(size=(BT, na)).astype(np.float32) * 0.5
    m_col = rng.normal(size=(BT, nt)).astype(np.float32) * 0.5
    z_row = (rng.random((BT, na)) + 0.5).astype(np.float32)
    z_col = (rng.random((BT, nt)) + 0.5).astype(np.float32)
    he = rng.normal(size=(BT, na, nt, H)).astype(np.float32)
    if dropout:
        ka = (rng.random((BT, na, nt)) > 0.5).astype(np.float32)
        kn = (rng.random((BT, na, nt)) > 0.5).astype(np.float32)
        keep = 0.5
    else:
        ka = kn = m
        keep = 1.0
    return tuple(jnp.asarray(x)
                 for x in (e, m_row, m_col, z_row, z_col, he, m, ka, kn)
                 ) + (keep,)


@pytest.mark.parametrize("dropout", [False, True])
def test_gat_aggregate_forward(dropout):
    from trackmpnn_tpu.ops.pallas_gat import (
        gat_aggregate, reference_gat_aggregate)

    rng = np.random.default_rng(4)
    args = _agg_inputs(rng, dropout=dropout)
    rs, cs = gat_aggregate(*args, 4, True)
    w_rs, w_cs = reference_gat_aggregate(*args)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(w_rs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(w_cs),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dropout", [False, True])
def test_gat_aggregate_grads(dropout):
    from trackmpnn_tpu.ops.pallas_gat import (
        gat_aggregate, reference_gat_aggregate)

    rng = np.random.default_rng(5)
    args = _agg_inputs(rng, BT=5, dropout=dropout)
    keep = args[-1]
    diff_args = args[:6]          # e, m_row, m_col, z_row, z_col, he
    rest = args[6:9]              # mask3, ka, kn
    H = args[5].shape[-1]
    wr = jax.random.normal(jax.random.key(4), args[5].shape[:2] + (H,))
    wc = jax.random.normal(jax.random.key(5),
                           (args[5].shape[0], args[5].shape[2], H))

    def scalar(f):
        def s(*xs):
            rs, cs = f(*xs, *rest, keep)
            return jnp.sum(rs * wr) + jnp.sum(cs * wc)
        return s

    fused = lambda *xs: gat_aggregate(*xs, 4, True)
    g_f = jax.grad(scalar(fused), argnums=tuple(range(6)))(*diff_args)
    g_r = jax.grad(scalar(reference_gat_aggregate),
                   argnums=tuple(range(6)))(*diff_args)
    for x, y, name in zip(g_f, g_r,
                          ["de", "dm_row", "dm_col", "dz_row", "dz_col",
                           "dhe"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


# ---------------------------------------------------------- round-4 kernels --
# Stacked-head (_mh) kernels == per-head single-head kernels, values + VJP.
def _mh_inputs(rng, nh, BT=9, na=8, nt=8, H=16):
    has, hns, aas = [], [], []
    _, _, _, m = make_inputs(rng, BT, na, nt, H)
    for _ in range(nh):
        ha, hn, a, _ = make_inputs(rng, BT, na, nt, H)
        has.append(ha)
        hns.append(hn)
        aas.append(a)
    return (jnp.concatenate(has, -1), jnp.concatenate(hns, -1),
            jnp.concatenate(aas, 0), m, has, hns, aas)


@pytest.mark.parametrize("nh", [1, 3])
def test_gat_scores_stats_mh_matches_per_head(nh):
    from trackmpnn_tpu.ops.pallas_gat import (gat_scores_stats,
                                              gat_scores_stats_mh)

    rng = np.random.default_rng(10 + nh)
    ha_s, hn_s, a_s, m, has, hns, aas = _mh_inputs(rng, nh)
    e, rmax, cmax, sal, sbl = gat_scores_stats_mh(ha_s, hn_s, a_s, m,
                                                  ALPHA, nh, 4, True)
    for h in range(nh):
        eh, rh, ch, sah, sbh = gat_scores_stats(has[h], hns[h], aas[h], m,
                                                ALPHA, 4, True)
        np.testing.assert_allclose(np.asarray(e[h]), np.asarray(eh),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rmax[h]), np.asarray(rh),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cmax[h]), np.asarray(ch),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sal[h]), np.asarray(sah),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sbl[h]), np.asarray(sbh),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nh", [2])
def test_gat_scores_stats_mh_grads(nh):
    from trackmpnn_tpu.ops.pallas_gat import (gat_scores_stats,
                                              gat_scores_stats_mh)

    rng = np.random.default_rng(20)
    ha_s, hn_s, a_s, m, has, hns, aas = _mh_inputs(rng, nh, BT=7)
    k = jax.random.key(3)
    H = has[0].shape[-1]
    na, nt = m.shape[1], m.shape[2]
    we = jax.random.normal(k, (nh, m.shape[0], na, nt))
    wa = jax.random.normal(jax.random.fold_in(k, 1), (nh, m.shape[0], na))
    wb = jax.random.normal(jax.random.fold_in(k, 2), (nh, m.shape[0], nt))

    def loss_mh(ha_s, hn_s, a_s):
        e, rmax, cmax, sal, sbl = gat_scores_stats_mh(
            ha_s, hn_s, a_s, m, ALPHA, nh, 4, True)
        return (jnp.sum(e * we) + jnp.sum(sal * wa) + jnp.sum(sbl * wb))

    def loss_ph(ha_s, hn_s, a_s):
        tot = 0.0
        for h in range(nh):
            e, rmax, cmax, sal, sbl = gat_scores_stats(
                ha_s[..., h * H:(h + 1) * H], hn_s[..., h * H:(h + 1) * H],
                a_s[h * H:(h + 1) * H], m, ALPHA, 4, True)
            tot += (jnp.sum(e * we[h]) + jnp.sum(sal * wa[h])
                    + jnp.sum(sbl * wb[h]))
        return tot

    g_m = jax.grad(loss_mh, argnums=(0, 1, 2))(ha_s, hn_s, a_s)
    g_p = jax.grad(loss_ph, argnums=(0, 1, 2))(ha_s, hn_s, a_s)
    for x, y, name in zip(g_m, g_p, ["dha", "dhn", "da"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("nh,keep", [(1, 1.0), (3, 1.0), (2, 0.5)])
def test_gat_aggregate_mh_matches_per_head(nh, keep):
    from trackmpnn_tpu.ops.pallas_gat import gat_aggregate, gat_aggregate_mh

    rng = np.random.default_rng(30 + nh)
    BT, na, nt, H = 7, 8, 8, 16
    _, _, _, m = make_inputs(rng, BT, na, nt, H)
    e = jnp.asarray(rng.normal(size=(nh, BT, na, nt)).astype(np.float32))
    mr = jnp.asarray(rng.normal(size=(nh, BT, na)).astype(np.float32))
    mc = jnp.asarray(rng.normal(size=(nh, BT, nt)).astype(np.float32))
    zr = jnp.asarray(rng.uniform(0.5, 2.0, size=(nh, BT, na)).astype(np.float32))
    zc = jnp.asarray(rng.uniform(0.5, 2.0, size=(nh, BT, nt)).astype(np.float32))
    he = jnp.asarray(rng.normal(size=(BT, na, nt, H)).astype(np.float32))
    ka = jnp.asarray((rng.random((nh, BT, na, nt)) < keep).astype(np.float32))
    kn = jnp.asarray((rng.random((nh, BT, na, nt)) < keep).astype(np.float32))

    def agg_mh(e, mr, mc, zr, zc, he):
        return gat_aggregate_mh(e, mr, mc, zr, zc, he, m, ka, kn, keep,
                                nh, 4, True)

    def agg_ph(e, mr, mc, zr, zc, he):
        rs = cs = 0.0
        for h in range(nh):
            r, c = gat_aggregate(e[h], mr[h], mc[h], zr[h],
                                 zc[h], he, m, ka[h], kn[h],
                                 keep, 4, True)
            rs = rs + r
            cs = cs + c
        return rs, cs

    got = agg_mh(e, mr, mc, zr, zc, he)
    want = agg_ph(e, mr, mc, zr, zc, he)
    for x, y, name in zip(got, want, ["rs", "cs"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-5, err_msg=name)

    k = jax.random.key(9)
    wr = jax.random.normal(k, got[0].shape)
    wc = jax.random.normal(jax.random.fold_in(k, 1), got[1].shape)

    def scal(f):
        def g(*xs):
            rs, cs = f(*xs)
            return jnp.sum(rs * wr) + jnp.sum(cs * wc)
        return g

    g_m = jax.grad(scal(agg_mh), argnums=(0, 1, 2, 3, 4, 5))(e, mr, mc, zr, zc, he)
    g_p = jax.grad(scal(agg_ph), argnums=(0, 1, 2, 3, 4, 5))(e, mr, mc, zr, zc, he)
    for x, y, name in zip(g_m, g_p, ["de", "dmr", "dmc", "dzr", "dzc", "dhe"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
