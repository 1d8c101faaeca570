import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.ops import (
    segment_argmax,
    segment_argmin,
    segment_logsumexp,
    segment_max,
    segment_min,
    segment_softmax,
    segment_sum,
)


def dense_oracle(values, ids, nseg, mask):
    out = np.zeros((nseg,) + values.shape[1:], values.dtype)
    for i in range(len(ids)):
        if mask[i]:
            out[ids[i]] += values[i]
    return out


def test_segment_sum_masked(rng):
    n, nseg = 64, 10
    vals = rng.normal(size=(n, 5)).astype(np.float32)
    ids = rng.integers(0, nseg, size=n).astype(np.int32)
    mask = rng.random(n) > 0.3
    # poison masked-out ids: must not matter
    ids_poison = np.where(mask, ids, 9999).astype(np.int32)
    got = segment_sum(jnp.asarray(vals), jnp.clip(jnp.asarray(ids_poison), 0, nseg), nseg, mask=jnp.asarray(mask))
    want = dense_oracle(vals, ids, nseg, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_segment_max_min(rng):
    n, nseg = 50, 8
    vals = rng.normal(size=n).astype(np.float32)
    ids = rng.integers(0, nseg, size=n).astype(np.int32)
    mask = rng.random(n) > 0.5
    gmax = np.asarray(segment_max(jnp.asarray(vals), jnp.asarray(ids), nseg, mask=jnp.asarray(mask)))
    gmin = np.asarray(segment_min(jnp.asarray(vals), jnp.asarray(ids), nseg, mask=jnp.asarray(mask)))
    for s in range(nseg):
        sel = vals[(ids == s) & mask]
        if len(sel):
            assert np.isclose(gmax[s], sel.max())
            assert np.isclose(gmin[s], sel.min())
        else:
            assert gmax[s] < -1e29 and gmin[s] > 1e29


def test_segment_argmax_ties():
    vals = jnp.asarray([1.0, 1.0, 0.0, 2.0, 2.0])
    ids = jnp.asarray([0, 0, 0, 1, 1])
    hi = segment_argmax(vals, ids, 3, tie="high")
    lo = segment_argmax(vals, ids, 3, tie="low")
    assert list(np.asarray(hi)) == [1, 4, -1]
    assert list(np.asarray(lo)) == [0, 3, -1]
    am = segment_argmin(vals, ids, 3)
    assert list(np.asarray(am)) == [2, 3, -1]


def test_segment_logsumexp_softmax(rng):
    n, nseg = 40, 6
    vals = (rng.normal(size=n) * 10).astype(np.float32)
    ids = rng.integers(0, nseg, size=n).astype(np.int32)
    mask = rng.random(n) > 0.2
    lse = np.asarray(segment_logsumexp(jnp.asarray(vals), jnp.asarray(ids), nseg, mask=jnp.asarray(mask)))
    sm = np.asarray(segment_softmax(jnp.asarray(vals), jnp.asarray(ids), nseg, mask=jnp.asarray(mask)))
    for s in range(nseg):
        sel = vals[(ids == s) & mask]
        if len(sel):
            want = np.log(np.sum(np.exp(sel - sel.max()))) + sel.max()
            assert np.isclose(lse[s], want, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                sm[(ids == s) & mask], np.exp(sel - want), rtol=1e-5, atol=1e-6
            )
    assert np.all(sm[~mask] == 0)


def test_segment_softmax_grad_finite_with_empty_last_bucket():
    """Regression: masked rows clip their segment id onto the LAST bucket;
    if that bucket is empty its lse is -1e30 and the unclamped exp produced
    inf forward values that became inf * 0 = NaN under grad (hit by GAT
    training with padded detection capacity)."""
    vals = jnp.asarray([0.5, -0.3, 1.2, 0.0], jnp.float32)
    ids = jnp.asarray([0, 0, 1, 5], jnp.int32)   # bucket 5 (last) masked-only
    mask = jnp.asarray([True, True, True, False])

    def f(v):
        sm = segment_softmax(v, ids, 6, mask=mask)
        return jnp.sum(sm * jnp.asarray([1.0, 2.0, 3.0, 4.0]))

    g = jax.grad(f)(vals)
    assert np.all(np.isfinite(np.asarray(g))), g
