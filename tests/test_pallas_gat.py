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
