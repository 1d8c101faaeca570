"""Fused-round Pallas kernels: interpret-mode value + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.ops import pallas_round as PR


@pytest.fixture(autouse=True)
def interpret_mode():
    PR._INTERPRET[0] = True
    yield
    PR._INTERPRET[0] = False


def make_problem(rng, B=2, cap=128, H=64):
    h = rng.normal(size=(B, cap, H)).astype(np.float32) * 0.5
    past = rng.integers(0, cap, (B, cap)).astype(np.int32)
    fut = rng.integers(0, cap, (B, cap)).astype(np.int32)
    kind = rng.integers(0, 3, (B, cap))  # 0 pad, 1 edge, 2 det
    edge = kind == 1
    det = kind == 2
    h[~(edge | det)] = 0.0
    shapes = [("w_ih", (H, 3 * H)), ("w_hh", (H, 3 * H)),
              ("b_ih", (3 * H,)), ("b_hh", (3 * H,))]
    we = {k: (0.2 * rng.normal(size=s)).astype(np.float32) for k, s in shapes}
    wn = {k: (0.2 * rng.normal(size=s)).astype(np.float32) for k, s in shapes}
    idxw = np.stack([past, fut, edge.astype(np.int32), det.astype(np.int32)], -1)
    args = (jnp.asarray(h), jnp.asarray(past), jnp.asarray(fut),
            jnp.asarray(det), jnp.asarray(edge | det),
            jax.tree_util.tree_map(jnp.asarray, we),
            jax.tree_util.tree_map(jnp.asarray, wn))
    return args, jnp.asarray(idxw)


def test_fused_round_forward(rng):
    (h, past, fut, det, live, we, wn), idxw = make_problem(rng)
    want = PR.round_reference(h, past, fut, det, live, we, wn)
    got = PR.fused_round(h, idxw, we, wn, None, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_packed_forward_fused_matches(rng):
    """packed_window_forward(fused_round=True) == the standard path, in
    interpret mode, on a real schedule."""
    import numpy as _np

    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.graph.schedule import build_window_schedule
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.train.packed import pack_schedules, packed_window_forward

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
    params = mpnn.init_params(jax.random.key(0), cfg)
    params = jax.tree_util.tree_map(
        lambda l: l + 0.2 * jax.random.normal(jax.random.key(1), l.shape), params)
    stats = mpnn.init_batch_stats(cfg)
    scheds = []
    s = 0
    while len(scheds) < 2:
        feats, bp, _ = make_sequence(num_tracks=3, num_frames=4, seed=s)
        ws = build_window_schedule(feats, bp[:, :2].astype(_np.int64),
                                   cap=128, t_cap=6)
        if ws is not None:
            scheds.append(ws)
        s += 1
    pb = pack_schedules(scheds, 128, 6)
    l0, aux0 = packed_window_forward(params, stats, cfg, pb, True)
    # the fused path tiles at 512 by default; small caps divide down inside
    # fused_round only when cap % tile == 0, so use tile via cap=128 -> the
    # kernel asserts divisibility; patch tile through the module default
    l1, aux1 = packed_window_forward(params, stats, cfg, pb, True,
                                     fused_round=True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux1["hidden"]),
                               np.asarray(aux0["hidden"]), rtol=1e-3, atol=1e-4)


def test_fused_round_gradients(rng):
    (h, past, fut, det, live, we, wn), idxw = make_problem(rng, B=2, cap=64)

    cot = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
    # cotangents only on live rows (as the model produces)
    cot = jnp.where((idxw[..., 2] == 1) | (idxw[..., 3] == 1), 1.0, 0.0)[..., None] * cot

    def loss_ref(h_, we_, wn_):
        return jnp.sum(PR.round_reference(h_, past, fut, det, live, we_, wn_) * cot)

    def loss_fused(h_, we_, wn_):
        return jnp.sum(PR.fused_round(h_, idxw, we_, wn_, None, 64) * cot)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, we, wn)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(h, we, wn)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-3, atol=1e-4, err_msg="d_h")
    for key in ("w_ih", "w_hh", "b_ih", "b_hh"):
        np.testing.assert_allclose(np.asarray(gf[1][key]), np.asarray(gr[1][key]),
                                   rtol=1e-3, atol=1e-4, err_msg=f"edge {key}")
        np.testing.assert_allclose(np.asarray(gf[2][key]), np.asarray(gr[2][key]),
                                   rtol=1e-3, atol=1e-4, err_msg=f"node {key}")
