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


# ------------------------- block-structured data-parallel (fast path) -------
def test_sharded_block_step_matches_single_device():
    """shard_map'd block step over {'data': 4} == single-device block step:
    loss, aux, (sync-)BN stats, and raw GRADIENTS (post-Adam params are not
    comparable: g ~ 1e-9 noise on near-zero grads flips lr*sign updates)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from trackmpnn_tpu.parallel.block_parallel import (
        BLOCK_SPECS, _rebase, make_sharded_block_step)
    from trackmpnn_tpu.train.block import (block_window_forward,
                                           build_block_batch,
                                           make_block_train_step)

    cfg, params, stats, tx = setup(3)
    schedules = build_batch(8)
    bb = build_block_batch(schedules, TCAP)
    mesh = make_mesh({"data": 4}, jax.devices()[:4])

    # raw gradient equality (replicated grads require the cross-shard psum
    # the shard_map transpose inserts under vma tracking)
    def g_single(p):
        return block_window_forward(p, stats, cfg, bb, True)[0]

    def body(p, s, bbg):
        bbl = _rebase(bbg, "data")
        total, _ = block_window_forward(p, s, cfg, bbl, True,
                                        axis_name="data")
        return jax.lax.psum(total * bbl.step_valid.shape[1], "data") / 8.0

    sharded = shard_map(body, mesh=mesh,
                        in_specs=(P(), P(), BLOCK_SPECS), out_specs=P())
    g1 = jax.grad(g_single)(params)
    gn = jax.grad(lambda p: sharded(p, stats, bb))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)

    # full-step contract: loss/aux/stats equality (these steps DONATE their
    # param/stat inputs, so they run last)
    step1 = make_block_train_step(cfg, tx, True)
    p1, s1, o1, loss1, aux1 = step1(params, stats, tx.init(params), bb)
    stepn = make_sharded_block_step(mesh, cfg, tx, True)
    pn, sn, on, lossn, auxn = stepn(params, stats, tx.init(params), bb)
    np.testing.assert_allclose(float(lossn), float(loss1), rtol=1e-5)
    for k in ("loss_ce", "loss_f"):
        np.testing.assert_allclose(float(auxn[k]), float(aux1[k]), rtol=1e-5,
                                   atol=1e-7)
    for k in ("tp", "fp", "fn"):
        assert int(auxn[k]) == int(aux1[k]), k
    for a, b in zip(jax.tree_util.tree_leaves(sn),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_block_step_gat_runs():
    """GAT heads under the sharded block step: per-shard dropout rngs,
    psum'd sync-BN, finite loss, and training makes progress."""
    from trackmpnn_tpu.parallel.block_parallel import make_sharded_block_step
    from trackmpnn_tpu.train.block import build_block_batch

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16,
                           nattheads=1)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(3e-3)
    opt = tx.init(params)
    bb = build_block_batch(build_batch(4), TCAP)
    mesh = make_mesh({"data": 2}, jax.devices()[:2])
    step = make_sharded_block_step(mesh, cfg, tx, True)
    rng = jax.random.key(7)
    first = last = None
    for i in range(60):
        params, stats, opt, loss, aux = step(params, stats, opt, bb,
                                             rng=jax.random.fold_in(rng, i))
        assert np.isfinite(float(loss))
        first = first if first is not None else float(loss)
        last = float(loss)
    assert last < 0.8 * first, (first, last)


def test_sharded_block_step_rejects_indivisible_batch():
    from trackmpnn_tpu.parallel.block_parallel import make_sharded_block_step
    from trackmpnn_tpu.train.block import build_block_batch

    cfg, params, stats, tx = setup()
    bb = build_block_batch(build_batch(3), TCAP)
    mesh = make_mesh({"data": 2}, jax.devices()[:2])
    step = make_sharded_block_step(mesh, cfg, tx, True)
    with pytest.raises(ValueError):
        step(params, stats, tx.init(params), bb)


def test_sharded_block_step_defer_loss_matches_single_device():
    """The sharded fast path with the dispatch-floor config (defer_loss +
    hoisted BN) == single-device: loss, sync-BN running stats (incl. the
    psum'd phantom-row counts in the hoisted closed-form EMA), gradients."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from trackmpnn_tpu.parallel.block_parallel import (
        BLOCK_SPECS, _rebase, make_sharded_block_step)
    from trackmpnn_tpu.train.block import (block_window_forward,
                                           build_block_batch,
                                           make_block_train_step)

    cfg, params, stats, tx = setup(3)
    schedules = build_batch(8)
    bb = build_block_batch(schedules, TCAP)
    mesh = make_mesh({"data": 4}, jax.devices()[:4])

    def g_single(p):
        return block_window_forward(p, stats, cfg, bb, True,
                                    defer_loss=True)[0]

    def body(p, s, bbg):
        bbl = _rebase(bbg, "data")
        total, _ = block_window_forward(p, s, cfg, bbl, True,
                                        axis_name="data", defer_loss=True)
        return jax.lax.psum(total * bbl.step_valid.shape[1], "data") / 8.0

    sharded = shard_map(body, mesh=mesh,
                        in_specs=(P(), P(), BLOCK_SPECS), out_specs=P())
    g1 = jax.grad(g_single)(params)
    gn = jax.grad(lambda p: sharded(p, stats, bb))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)

    step1 = make_block_train_step(cfg, tx, True, defer_loss=True)
    p1, s1, o1, loss1, aux1 = step1(params, stats, tx.init(params), bb)
    stepn = make_sharded_block_step(mesh, cfg, tx, True, defer_loss=True)
    pn, sn, on, lossn, auxn = stepn(params, stats, tx.init(params), bb)
    np.testing.assert_allclose(float(lossn), float(loss1), rtol=1e-5)
    for k in ("tp", "fp", "fn"):
        assert int(auxn[k]) == int(aux1[k]), k
    for a, b in zip(jax.tree_util.tree_leaves(sn),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_block_step_fused_guard_matches_single_device():
    """fused=True under an off-TPU mesh must NOT crash: interpret-mode
    pallas cannot run under shard_map/check_vma on this JAX version, so
    block_window_forward guards it back to the XLA round (train/block.py).
    The guarded sharded step must equal the single-device XLA step after a
    full optimizer update.  (On real TPU meshes the kernels run compiled,
    with vma-annotated out_shapes and the custom-VJP weight-cotangent
    psums — ops/pallas_block.py.)"""
    from trackmpnn_tpu.parallel.block_parallel import make_sharded_block_step
    from trackmpnn_tpu.train.block import (build_block_batch,
                                           make_block_train_step)

    cfg, params, stats, tx = setup(5)
    bb = build_block_batch(build_batch(8), TCAP)
    mesh = make_mesh({"data": 4}, jax.devices()[:4])

    step1 = make_block_train_step(cfg, tx, False, fused=False,
                                  defer_loss=True, remat=False)
    p1, s1, o1, loss1, aux1 = step1(params, stats, tx.init(params), bb)
    stepn = make_sharded_block_step(mesh, cfg, tx, False, fused=True,
                                    defer_loss=True)
    pn, sn, on, lossn, auxn = stepn(params, stats, tx.init(params), bb)
    np.testing.assert_allclose(float(lossn), float(loss1), rtol=1e-5)
    for k in ("tp", "fp", "fn"):
        assert int(auxn[k]) == int(aux1[k]), k
    for a, b in zip(jax.tree_util.tree_leaves(pn),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
