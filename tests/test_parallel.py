"""SPMD tests on the 8-device virtual CPU mesh: sharded training must
compile, run, and match the single-device result bitwise-ish."""

import jax
import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.graph.schedule import build_window_schedule
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.parallel import batch_schedules, make_mesh, make_sharded_train_step
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.step import window_forward, schedule_to_device


CAP, TCAP = 256, 8


def build_batch(n, cap=CAP, t_cap=TCAP):
    out = []
    s = 0
    while len(out) < n:
        feats, bp, _ = make_sequence(num_tracks=4, num_frames=6, seed=s)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64), cap=cap, t_cap=t_cap)
        if ws is not None:
            out.append(ws)
        s += 1
    return out


def setup(seed=0):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(seed), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-3)
    return cfg, params, stats, tx


@pytest.mark.parametrize("axes", [{"data": 8}, {"data": 4, "edge": 2}, {"data": 2, "edge": 4}])
def test_sharded_matches_single_device(axes):
    assert len(jax.devices()) >= 8
    cfg, params, stats, tx = setup()
    opt_state = tx.init(params)
    schedules = build_batch(8)
    sbatch = batch_schedules(schedules, CAP, TCAP)

    # single-device reference first (the sharded step donates its inputs)
    from trackmpnn_tpu.parallel.data_parallel import batched_window_forward

    def loss_fn(p, s, b):
        return batched_window_forward(p, s, cfg, b, True)

    (loss0, aux0), grads0 = jax.value_and_grad(loss_fn, has_aux=True)(params, stats, sbatch)

    mesh = make_mesh(axes)
    edge_axis = "edge" if "edge" in axes else None

    # gradient parity under SPMD shardings (isolates mesh numerics from
    # Adam's rsqrt amplification of reduction-order noise)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from trackmpnn_tpu.parallel.data_parallel import _schedule_shardings

    repl = NamedSharding(mesh, P())
    sched_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), _schedule_shardings(mesh, edge_axis),
        is_leaf=lambda x: isinstance(x, P),
    )
    sharded_vg = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True),
        in_shardings=(repl, repl, sched_sh),
    )
    (loss1, _), grads1 = sharded_vg(params, stats, jax.device_put(sbatch, sched_sh))
    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads1), jax.tree_util.tree_leaves(grads0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)

    # and the full donating train step must run on every mesh shape
    step = make_sharded_train_step(mesh, cfg, tx, True, edge_axis=edge_axis)
    p1, st1, _, loss_s, _ = step(params, stats, opt_state, sbatch)
    assert np.isfinite(float(loss_s))


def test_dp_loss_matches_mean_of_windows():
    cfg, params, stats, tx = setup()
    schedules = build_batch(4)
    sbatch = batch_schedules(schedules, CAP, TCAP)
    from trackmpnn_tpu.parallel.data_parallel import batched_window_forward

    loss_b, _ = batched_window_forward(params, stats, cfg, sbatch, True)
    singles = []
    for ws in schedules:
        sb = schedule_to_device(ws)
        loss, _ = window_forward(params, stats, cfg, sb, True, train=True)
        singles.append(float(loss))
    np.testing.assert_allclose(float(loss_b), np.mean(singles), rtol=1e-5)
