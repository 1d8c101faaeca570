"""Interpret-mode parity for the Pallas message-passing kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from trackmpnn_tpu.ops import pallas_mp


def make_problem(rng, n=256, h=64):
    hid = rng.normal(size=(n, h)).astype(np.float32)
    past = rng.integers(0, n, n).astype(np.int32)
    fut = rng.integers(0, n, n).astype(np.int32)
    edge = rng.random(n) > 0.5
    wih = (0.1 * rng.normal(size=(h, 3 * h))).astype(np.float32)
    whh = (0.1 * rng.normal(size=(h, 3 * h))).astype(np.float32)
    bih = (0.1 * rng.normal(size=3 * h)).astype(np.float32)
    bhh = (0.1 * rng.normal(size=3 * h)).astype(np.float32)
    return hid, past, fut, edge, wih, whh, bih, bhh


def test_fused_edge_gru_interpret(rng):
    hid, past, fut, edge, wih, whh, bih, bhh = map(jnp.asarray, make_problem(rng))
    want = pallas_mp.edge_gru_reference(hid, past, fut, edge, wih, whh, bih, bhh)
    got = pallas_mp.fused_edge_gru(hid, past, fut, edge, wih, whh, bih, bhh,
                                   interpret=True, tile=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_signed_segment_sum_interpret(rng):
    hid, past, fut, edge, *_ = map(jnp.asarray, make_problem(rng, n=128, h=32))
    want = pallas_mp.signed_segment_sum_reference(hid, past, fut, edge, 128)
    got = pallas_mp.signed_segment_sum_pallas(hid, past, fut, edge, 128,
                                              interpret=True, tile=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gather_diff_interpret(rng):
    hid, past, fut, edge, *_ = map(jnp.asarray, make_problem(rng, n=128, h=32))
    want = pallas_mp.gather_diff_reference(hid, past, fut, edge)
    got = pallas_mp.gather_diff_pallas(hid, past, fut, edge, interpret=True, tile=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_gather_diff_grad(rng):
    hid, past, fut, edge, *_ = map(jnp.asarray, make_problem(rng, n=128, h=32))

    def f_dispatch(h):
        return jnp.sum(jnp.cos(pallas_mp.gather_diff(h, past, fut, edge)))

    def f_ref(h):
        return jnp.sum(jnp.cos(pallas_mp.gather_diff_reference(h, past, fut, edge)))

    g1 = jax.grad(f_dispatch)(hid)
    g2 = jax.grad(f_ref)(hid)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_signed_segment_sum_grad(rng):
    """custom-vjp backward must equal autodiff of the reference."""
    hid, past, fut, edge, *_ = map(jnp.asarray, make_problem(rng, n=128, h=32))

    def f_dispatch(h):
        return jnp.sum(jnp.sin(pallas_mp.signed_segment_sum(h, past, fut, edge, 128)))

    def f_ref(h):
        return jnp.sum(jnp.sin(pallas_mp.signed_segment_sum_reference(h, past, fut, edge, 128)))

    g1 = jax.grad(f_dispatch)(hid)
    g2 = jax.grad(f_ref)(hid)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_backend_flag(monkeypatch):
    monkeypatch.delenv("TM_PALLAS", raising=False)
    assert pallas_mp.mp_backend() == "xla"
    monkeypatch.setenv("TM_PALLAS", "1")
    assert pallas_mp.mp_backend() == "pallas"
