"""Block-structured fast path == packed path (loss, aux, grads).

The block step (train/block.py) re-derives the whole training computation
in dual (compact-det, padded-rectangle-edge) layout; these tests pin it to
packed_window_forward, which is itself pinned to the reference
(tests/test_reference_parity.py), so agreement here transfers reference
parity to the fast path."""

import jax
import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.graph.schedule import build_window_schedule
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.block import (
    build_block_batch,
    block_window_forward,
    make_block_train_step,
)
from trackmpnn_tpu.train.packed import pack_schedules, packed_window_forward

CAP, TCAP = 256, 10


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """XLA:CPU's LLVM backend segfaults ORDER-DEPENDENTLY when enough
    distinct block-step programs accumulate in one process (the same
    flakiness that caps the CPU TM_PREFIX_K default at 2; every crashing
    test passes in isolation).  Dropping the executable cache between
    tests in this file keeps the accumulation below the trigger at the
    cost of some recompiles."""
    yield
    jax.clear_caches()


def build(n, seed0=0):
    out, s = [], seed0
    while len(out) < n:
        feats, bp, _ = make_sequence(num_tracks=4, num_frames=5 + (s % 3),
                                     seed=s, miss_rate=0.15, fp_rate=0.2)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64),
                                   cap=CAP, t_cap=TCAP)
        if ws is not None:
            out.append(ws)
        s += 1
    return out


def _model(msg_type="diff", seed=0):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16,
                           msg_type=msg_type)
    params = mpnn.init_params(jax.random.key(seed), cfg)
    params = jax.tree_util.tree_map(
        lambda l: l + 0.2 * jax.random.normal(jax.random.key(seed + 1), l.shape),
        params)
    stats = mpnn.init_batch_stats(cfg)
    return cfg, params, stats


def _assert_tree_close(a, b, rtol=1e-3, atol=3e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("msg_type", ["diff", "concat"])
@pytest.mark.parametrize("tp_classifier", [True, False])
def test_block_matches_packed(msg_type, tp_classifier):
    cfg, params, stats = _model(msg_type)
    schedules = build(4)
    pb = pack_schedules(schedules, CAP, TCAP)
    bb = build_block_batch(schedules, TCAP)

    def run(fwd, batch):
        def f(p):
            loss, aux = fwd(p, stats, cfg, batch, tp_classifier)
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    lp, ap, gp = run(packed_window_forward, pb)
    lb, ab, gb = run(block_window_forward, bb)

    np.testing.assert_allclose(float(lb), float(lp), rtol=1e-4)
    np.testing.assert_allclose(float(ab["loss_ce"]), float(ap["loss_ce"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(ab["loss_f"]), float(ap["loss_f"]), rtol=1e-4, atol=1e-6)
    for k in ("tp", "fp", "fn"):
        assert int(ab[k]) == int(ap[k]), k
    _assert_tree_close(gb, gp)
    _assert_tree_close(ab["batch_stats"], ap["batch_stats"])


def test_block_matches_packed_eval_mode():
    cfg, params, stats = _model()
    schedules = build(3, seed0=40)
    pb = pack_schedules(schedules, CAP, TCAP)
    bb = build_block_batch(schedules, TCAP)
    lp, ap = packed_window_forward(params, stats, cfg, pb, True, train=False)
    lb, ab = block_window_forward(params, stats, cfg, bb, True, train=False)
    np.testing.assert_allclose(float(lb), float(lp), rtol=1e-4)
    for k in ("tp", "fp", "fn"):
        assert int(ab[k]) == int(ap[k]), k


def test_block_merged_deferred_loss_matches_split(monkeypatch):
    """The merged deferred-loss pass (TM_MERGED_LOSS=1: one full-width vmap
    over all T steps) == the default per-segment pass: loss, counts and
    grads, at a multi-segment K so the pad+concat path is exercised.
    (Merged measured slower on-chip — logs/bench_merged_loss.log — so it
    is opt-in; this pins that the opt-in stays correct.)"""
    cfg, params, stats = _model(seed=11)
    bb = build_block_batch(build(3, seed0=80), TCAP)
    monkeypatch.setenv("TM_PREFIX_K", "3")
    monkeypatch.setenv("TM_MERGED_LOSS", "1")

    def run():
        def f(p):
            return block_window_forward(p, stats, cfg, bb, True,
                                        defer_loss=True)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    lm, am, gm = run()
    monkeypatch.setenv("TM_MERGED_LOSS", "0")
    ls, as_, gs = run()
    np.testing.assert_allclose(float(lm), float(ls), rtol=1e-6)
    for k in ("tp", "fp", "fn"):
        assert int(am[k]) == int(as_[k]), k
    _assert_tree_close(gm, gs, rtol=1e-5)


@pytest.mark.parametrize("defer", [False, True])
@pytest.mark.parametrize("k", [1, 3, 4])
def test_block_prefix_k_invariance(monkeypatch, k, defer):
    """Loss, aux AND grads are invariant to the prefix-segment count
    (TM_PREFIX_K): the segment-boundary carry handoff (h_e padding, per-
    segment views, loss accumulation) must be exact.  The CPU suite
    otherwise only ever runs K=2 (VERDICT r4 weak-#2); K=3 puts a boundary
    at a non-divisor of T, K=4 at the TPU default's granularity."""
    cfg, params, stats = _model(seed=9)
    schedules = build(4, seed0=60)
    bb = build_block_batch(schedules, TCAP)

    def run():
        def f(p):
            return block_window_forward(p, stats, cfg, bb, True,
                                        defer_loss=defer)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    monkeypatch.setenv("TM_PREFIX_K", "1")
    l1, a1, g1 = run()
    monkeypatch.setenv("TM_PREFIX_K", str(k))
    lk, ak, gk = run()
    np.testing.assert_allclose(float(lk), float(l1), rtol=1e-5)
    for key in ("tp", "fp", "fn"):
        assert int(ak[key]) == int(a1[key]), key
    _assert_tree_close(gk, g1, rtol=1e-4)
    _assert_tree_close(ak["batch_stats"], a1["batch_stats"], rtol=1e-4)


def test_block_ragged_batch_with_ended_windows():
    """Windows of different lengths: ended windows freeze their state and
    contribute nothing to later steps (the any_valid/valid masking)."""
    cfg, params, stats = _model(seed=7)
    schedules = []
    for frames in (4, 8):
        s = 0
        while True:
            feats, bp, _ = make_sequence(num_tracks=3, num_frames=frames,
                                         seed=200 + s, miss_rate=0.2, fp_rate=0.3)
            ws = build_window_schedule(feats, bp[:, :2].astype(np.int64),
                                       cap=CAP, t_cap=TCAP)
            if ws is not None:
                schedules.append(ws)
                break
            s += 1
    assert schedules[0].n_steps != schedules[1].n_steps
    pb = pack_schedules(schedules, CAP, TCAP)
    bb = build_block_batch(schedules, TCAP)
    lp, ap = packed_window_forward(params, stats, cfg, pb, False)
    lb, ab = block_window_forward(params, stats, cfg, bb, False)
    np.testing.assert_allclose(float(lb), float(lp), rtol=1e-4)
    for k in ("tp", "fp", "fn"):
        assert int(ab[k]) == int(ap[k]), k


def test_block_train_step_converges():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(3e-3)
    opt = tx.init(params)
    step = make_block_train_step(cfg, tx, True)
    bb = build_block_batch(build(4), TCAP)
    first = last = None
    for _ in range(80):
        params, stats, opt, loss, aux = step(params, stats, opt, bb)
        first = first if first is not None else float(loss)
        last = float(loss)
    assert last < 0.5 * first, (first, last)


def _gat_model(nattheads=2, seed=0):
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16,
                           nattheads=nattheads)
    params = mpnn.init_params(jax.random.key(seed), cfg)
    params = jax.tree_util.tree_map(
        lambda l: l + 0.2 * jax.random.normal(jax.random.key(seed + 1), l.shape),
        params)
    return cfg, params, mpnn.init_batch_stats(cfg)


@pytest.mark.parametrize("fused", [False, True])
@pytest.mark.parametrize("train", [True, False])
def test_block_gat_matches_packed(monkeypatch, train, fused):
    """GAT heads in dual layout == row layout (loss, aux, grads), with and
    without the fused round (GAT uses the kernel for the edge GRU only).

    Attention dropout is neutralized (ATT_DROPOUT=0) because the two
    layouts draw their keep masks in different shapes/orders; with it off,
    the attention math must agree exactly."""
    monkeypatch.setattr(mpnn, "ATT_DROPOUT", 0.0)
    cfg, params, stats = _gat_model()
    schedules = build(3)
    pb = pack_schedules(schedules, CAP, TCAP)
    bb = build_block_batch(schedules, TCAP)
    rng = jax.random.key(11)

    def run(fwd, batch, **kw):
        def f(p):
            return fwd(p, stats, cfg, batch, True, train=train, rng=rng,
                       **kw)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    lp, ap, gp = run(packed_window_forward, pb)
    lb, ab, gb = run(block_window_forward, bb, fused=fused)
    np.testing.assert_allclose(float(lb), float(lp), rtol=1e-4)
    np.testing.assert_allclose(float(ab["loss_ce"]), float(ap["loss_ce"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(ab["loss_f"]), float(ap["loss_f"]),
                               rtol=1e-4, atol=1e-6)
    for k in ("tp", "fp", "fn"):
        assert int(ab[k]) == int(ap[k]), k
    if train:
        _assert_tree_close(gb, gp)
        _assert_tree_close(ab["batch_stats"], ap["batch_stats"])


def test_block_gat_xla_attention_with_fused_round(monkeypatch):
    """gat_fused=False keeps the fused Pallas round but routes attention
    through XLA — the production fallback when the stacked-head kernels
    fail to compile at some (nh, G, K) (train/block.py gat_fallback).
    Numerics must equal the fully-fused path (dropout off)."""
    monkeypatch.setattr(mpnn, "ATT_DROPOUT", 0.0)
    cfg, params, stats = _gat_model(nattheads=3)
    bb = build_block_batch(build(3), TCAP)
    rng = jax.random.key(11)

    def run(gat_fused):
        def f(p):
            return block_window_forward(p, stats, cfg, bb, True, train=True,
                                        rng=rng, fused=True,
                                        gat_fused=gat_fused)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    lf, af, gf = run(True)
    lx, ax, gx = run(False)
    np.testing.assert_allclose(float(lx), float(lf), rtol=1e-4)
    for k in ("tp", "fp", "fn"):
        assert int(ax[k]) == int(af[k]), k
    _assert_tree_close(gx, gf)


def test_block_gat_dropout_trains():
    """With real attention dropout the GAT block step runs and converges."""
    cfg, params, stats = _gat_model(nattheads=1, seed=3)
    tx = optim.make_optimizer(3e-3)
    opt = tx.init(params)
    step = make_block_train_step(cfg, tx, True)
    bb = build_block_batch(build(3), TCAP)
    rng = jax.random.key(0)
    first = last = None
    for i in range(40):
        params, stats, opt, loss, aux = step(params, stats, opt, bb,
                                             rng=jax.random.fold_in(rng, i))
        assert np.isfinite(float(loss))
        first = first if first is not None else float(loss)
        last = float(loss)
    assert last < 0.7 * first, (first, last)


def test_block_gat_requires_rng_in_train():
    cfg, params, stats = _gat_model()
    bb = build_block_batch(build(1), TCAP)
    with pytest.raises(ValueError):
        block_window_forward(params, stats, cfg, bb, True, train=True)
    # eval mode needs no rng
    block_window_forward(params, stats, cfg, bb, True, train=False)


@pytest.mark.parametrize("mode", ["1", "2"])
@pytest.mark.parametrize("msg_type", ["diff", "concat"])
def test_block_es_kernel_matches_partials_round(monkeypatch, msg_type,
                                                mode):
    """The scatter-free round == the rs/cs-partials kernel + XLA
    segment_sum: loss, counts, grads.  mode "1" = integrated
    fused_block_round_es (gather + edge_support INSIDE the round kernel);
    mode "2" = the production composition (window_gather2/window_scatter
    around the proven round kernel — the integrated backward does not
    compile on the TPU toolchain)."""
    cfg, params, stats = _model(msg_type, seed=13)
    bb = build_block_batch(build(3, seed0=20), TCAP)

    def run(m):
        monkeypatch.setenv("TM_ES_KERNEL", m)
        def f(p):
            return block_window_forward(p, stats, cfg, bb, True, fused=True)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    lp, ap, gp = run("0")
    le, ae, ge = run(mode)
    np.testing.assert_allclose(float(le), float(lp), rtol=1e-5)
    for k in ("tp", "fp", "fn"):
        assert int(ae[k]) == int(ap[k]), k
    _assert_tree_close(ge, gp)


@pytest.mark.parametrize("msg_type", ["diff", "concat"])
def test_block_fused_round_matches_xla(msg_type):
    """fused=True (Pallas round, interpret mode on CPU) == XLA block path:
    loss, aux and grads."""
    cfg, params, stats = _model(msg_type, seed=5)
    schedules = build(3, seed0=10)
    bb = build_block_batch(schedules, TCAP)

    def run(fused):
        def f(p):
            return block_window_forward(p, stats, cfg, bb, True, fused=fused)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    lx, ax, gx = run(False)
    lf, af, gf = run(True)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    for k in ("tp", "fp", "fn"):
        assert int(af[k]) == int(ax[k]), k
    _assert_tree_close(gf, gx)


@pytest.mark.parametrize("tp_classifier", [True, False])
def test_block_fused_loss_optin_matches_xla(monkeypatch, tp_classifier):
    """TM_FUSED_LOSS=1 routes the edge losses through ops/pallas_loss.py
    (opt-in: measured slower on-chip than the XLA loss path, kept correct
    for future mega-fusion work)."""
    monkeypatch.setenv("TM_FUSED_LOSS", "1")
    cfg, params, stats = _model(seed=9)
    bb = build_block_batch(build(3, seed0=20), TCAP)

    def run(fused):
        def f(p):
            return block_window_forward(p, stats, cfg, bb, tp_classifier,
                                        fused=fused)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    lf, af, gf = run(True)
    monkeypatch.delenv("TM_FUSED_LOSS")
    lx, ax, gx = run(False)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    for k in ("loss_ce", "loss_f"):
        np.testing.assert_allclose(float(af[k]), float(ax[k]), rtol=1e-4,
                                   atol=1e-6)
    for k in ("tp", "fp", "fn"):
        assert int(af[k]) == int(ax[k]), k
    _assert_tree_close(gf, gx)


def test_block_fused_train_step_converges():
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(3e-3)
    opt = tx.init(params)
    step = make_block_train_step(cfg, tx, True, fused=True)
    bb = build_block_batch(build(4), TCAP)
    first = last = None
    for _ in range(60):
        params, stats, opt, loss, aux = step(params, stats, opt, bb)
        first = first if first is not None else float(loss)
        last = float(loss)
    assert last < 0.5 * first, (first, last)


def test_block_bf16_close_to_f32():
    """compute_dtype=bf16 (the batched CLI default) must track f32: loss to
    ~1e-2 relative and gradient direction per parameter.  bf16 only touches
    the GRU matmul inputs and the edge-state carry; losses accumulate f32."""
    import jax.numpy as jnp

    from trackmpnn_tpu.train.block import block_window_forward

    cfg, params, stats = _model()
    schedules = build(3)
    bb = build_block_batch(schedules, TCAP)

    def loss_of(dt):
        def f(p):
            return block_window_forward(p, stats, cfg, bb, tp_classifier=True,
                                        compute_dtype=dt)
        (l, _), g = jax.value_and_grad(f, has_aux=True)(params)
        return float(l), g

    l32, g32 = loss_of(None)
    l16, g16 = loss_of(jnp.bfloat16)
    assert abs(l16 - l32) / abs(l32) < 1e-2, (l16, l32)
    for a, b in zip(jax.tree_util.tree_leaves(g32), jax.tree_util.tree_leaves(g16)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 1e-12:
            cos = float(np.dot(a, b) / denom)
            assert cos > 0.99, cos


@pytest.mark.parametrize("tp_classifier", [True, False])
@pytest.mark.parametrize("fused,msg_type", [(False, "diff"), (True, "diff"),
                                            (True, "concat")])
def test_block_defer_loss_matches_inscan(tp_classifier, fused, msg_type):
    """defer_loss=True (loss side vmapped over steps post-scan) must be
    numerically identical to the in-scan loss path: same loss, aux and
    grads, for both the XLA and fused-Pallas rounds (interpret off-TPU)."""
    cfg, params, stats = _model(msg_type)
    schedules = build(4)
    bb = build_block_batch(schedules, TCAP)

    def run(defer):
        def f(p):
            return block_window_forward(p, stats, cfg, bb, tp_classifier,
                                        fused=fused, defer_loss=defer)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    l0, a0, g0 = run(False)
    l1, a1, g1 = run(True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for k in ("loss_ce", "loss_f"):
        np.testing.assert_allclose(float(a1[k]), float(a0[k]), rtol=1e-6)
    for k in ("tp", "fp", "fn"):
        assert int(a1[k]) == int(a0[k]), k
    # 3e-7 atol: the deferred path reassociates f32 sums across the step
    # axis (losses themselves agree at rtol 1e-6 above)
    _assert_tree_close(g1, g0, rtol=1e-5, atol=3e-7)
    # hoisted-BN running stats (closed-form EMA fold) == in-scan chain
    _assert_tree_close(a1["batch_stats"], a0["batch_stats"],
                       rtol=1e-5, atol=1e-7)


def test_block_defer_loss_no_hoist_bn(monkeypatch):
    """TM_HOIST_BN=0 keeps BN in-scan under defer_loss; same numbers."""
    monkeypatch.setenv("TM_HOIST_BN", "0")
    cfg, params, stats = _model("diff")
    bb = build_block_batch(build(4), TCAP)
    l0, a0 = block_window_forward(params, stats, cfg, bb, False)
    l1, a1 = block_window_forward(params, stats, cfg, bb, False,
                                  defer_loss=True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    _assert_tree_close(a1["batch_stats"], a0["batch_stats"],
                       rtol=1e-6, atol=1e-8)


def test_block_defer_loss_gat_and_ragged():
    """Deferred loss with GAT heads + ragged (ended-window) batches."""
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16,
                           nattheads=2)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    schedules = build(3) + build(1, seed0=50)
    bb = build_block_batch(schedules, TCAP)
    rng = jax.random.key(3)

    def run(defer):
        def f(p):
            return block_window_forward(p, stats, cfg, bb, True, rng=rng,
                                        defer_loss=defer)
        (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, aux, grads

    l0, a0, g0 = run(False)
    l1, a1, g1 = run(True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for k in ("tp", "fp", "fn"):
        assert int(a1[k]) == int(a0[k]), k
    _assert_tree_close(g1, g0, rtol=1e-5, atol=1e-7)
