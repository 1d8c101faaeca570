"""Fused Pallas block-round kernel == XLA oracle (values and VJP).

Interpret mode locks the semantics on CPU; the on-chip compile/perf runs
live in tools/bench_fused_block.py (TPU, one process at a time)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.ops.pallas_block import (
    fused_block_round,
    reference_block_round,
)


def make_inputs(rng, BT=11, na=8, nt=16, H=16, dtype=jnp.float32):
    he = rng.normal(size=(BT, na, nt, H)).astype(np.float32)
    ga = rng.normal(size=(BT, na, 3 * H)).astype(np.float32)
    gb = rng.normal(size=(BT, nt, 3 * H)).astype(np.float32)
    whh = (rng.normal(size=(H, 3 * H)) * 0.3).astype(np.float32)
    bhh = (rng.normal(size=(3 * H,)) * 0.1).astype(np.float32)
    web = (rng.normal(size=(H, 1)) * 0.4).astype(np.float32)
    blk_na = rng.integers(0, na + 1, size=BT)
    blk_nt = rng.integers(0, nt + 1, size=BT)
    m = ((np.arange(na)[None, :, None] < blk_na[:, None, None])
         & (np.arange(nt)[None, None, :] < blk_nt[:, None, None])
         ).astype(np.float32)
    he = (he * m[..., None]).astype(dtype)  # carry invariant: padding is 0
    return (jnp.asarray(he), jnp.asarray(ga), jnp.asarray(gb),
            jnp.asarray(whh), jnp.asarray(bhh), jnp.asarray(web),
            jnp.asarray(m))


@pytest.mark.parametrize("sign", [-1.0, 1.0])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_block_round_forward(sign, dtype):
    rng = np.random.default_rng(0)
    args = make_inputs(rng, dtype=dtype)
    mm_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else None
    eo, rs, cs, lg = fused_block_round(*args, sign, mm_dtype, 4, True)
    eo_r, rs_r, cs_r, lg_r = reference_block_round(*args, sign, mm_dtype)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else \
        dict(rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eo, np.float32),
                               np.asarray(eo_r, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rs_r), **tol)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cs_r), **tol)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_r), **tol)
    # padding entries are exactly zero
    m = np.asarray(args[-1])
    assert np.all(np.asarray(eo, np.float32)[m == 0] == 0)


@pytest.mark.parametrize("sign", [-1.0, 1.0])
def test_fused_block_round_grads(sign):
    rng = np.random.default_rng(1)
    he, ga, gb, whh, bhh, web, m = make_inputs(rng, BT=7, na=8, nt=8, H=8)
    keys = jax.random.split(jax.random.key(0), 4)
    w_eo = jax.random.normal(keys[0], he.shape)
    w_rs = jax.random.normal(keys[1], he.shape[:2] + he.shape[-1:])
    w_cs = jax.random.normal(keys[2], (he.shape[0], he.shape[2], he.shape[3]))
    w_lg = jax.random.normal(keys[3], he.shape[:3])

    def scalar(f):
        def g(he, ga, gb, whh, bhh, web):
            eo, rs, cs, lg = f(he, ga, gb, whh, bhh, web, m, sign, None)
            return (jnp.sum(eo * w_eo) + jnp.sum(rs * w_rs)
                    + jnp.sum(cs * w_cs) + jnp.sum(lg * w_lg))
        return g

    fused = lambda *a: fused_block_round(*a[:7], a[7], a[8], 4, True)
    g_f = jax.grad(scalar(fused), argnums=(0, 1, 2, 3, 4, 5))(
        he, ga, gb, whh, bhh, web)
    g_r = jax.grad(scalar(reference_block_round), argnums=(0, 1, 2, 3, 4, 5))(
        he, ga, gb, whh, bhh, web)
    for a, b, name in zip(g_f, g_r,
                          ["dhe", "dga", "dgb", "dwhh", "dbhh", "dweb"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_block_round_grads_bf16_carry():
    """bf16 h_e: cotangents round-trip in bf16; compare against the oracle
    computed with the same dtypes (direction, not bitwise)."""
    rng = np.random.default_rng(2)
    he, ga, gb, whh, bhh, web, m = make_inputs(rng, BT=5, na=8, nt=8, H=8,
                                               dtype=jnp.bfloat16)

    def scalar(f):
        def g(he, ga, gb, whh, bhh):
            eo, rs, cs, lg = f(he, ga, gb, whh, bhh, web, m, -1.0,
                               jnp.bfloat16)
            return (jnp.sum(eo.astype(jnp.float32) ** 2)
                    + jnp.sum(rs * cs.sum(1)[:, None]) + jnp.sum(lg ** 2))
        return g

    fused = lambda *a: fused_block_round(*a[:7], a[7], a[8], 4, True)
    g_f = jax.grad(scalar(fused), argnums=(0, 3))(he, ga, gb, whh, bhh)
    g_r = jax.grad(scalar(reference_block_round), argnums=(0, 3))(
        he, ga, gb, whh, bhh)
    for a, b in zip(g_f, g_r):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        assert denom > 0
        assert float(np.dot(a, b) / denom) > 0.999
