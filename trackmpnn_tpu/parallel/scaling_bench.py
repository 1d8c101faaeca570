"""Scaling-efficiency harness: edges/s at 1..N devices (and hosts).

BASELINE.md asks for edges/s measured at 1 chip, 1 host, and N>=2 hosts
with >=80% scaling efficiency.  This harness runs the SPMD train step on
growing sub-meshes of whatever devices exist (real TPU slices in
production; the forced-host CPU mesh in tests - where the numbers validate
the mechanics, not the hardware) and reports per-device efficiency.

Usage:  python -m trackmpnn_tpu.parallel.scaling_bench [--devices 1 2 4 8]
"""

from __future__ import annotations

import json
import time
from typing import List

import numpy as np


def _timed(thunk, repeats: int) -> float:
    """Seconds per call.  Wall clock is only trustworthy on CPU; on the
    tunneled TPU backend use the device trace (utils/devicetime,
    CLAUDE.md timing rule)."""
    import jax

    out = thunk()  # warmup/compile
    jax.block_until_ready(out)
    if jax.default_backend() != "cpu":
        from trackmpnn_tpu.utils.devicetime import device_seconds_per_step

        return device_seconds_per_step(thunk, n=repeats)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = thunk()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def build_batch(n_windows: int, cap: int = 1024, t_cap: int = 12,
                tracks: int = 8, frames: int = 10):
    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.graph.schedule import build_window_schedule

    out, s = [], 0
    while len(out) < n_windows:
        feats, bp, _ = make_sequence(num_tracks=tracks, num_frames=frames,
                                     seed=200 + s, miss_rate=0.05, fp_rate=0.1)
        ws = build_window_schedule(feats, bp[:, :2].astype(np.int64),
                                   cap=cap, t_cap=t_cap)
        if ws is not None:
            out.append(ws)
        s += 1
    return out


def measure(device_counts: List[int], windows_per_device: int = 2,
            repeats: int = 10, nhidden: int = 64) -> dict:
    import jax

    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.parallel import batch_schedules, make_mesh, make_sharded_train_step
    from trackmpnn_tpu.train import optim

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=nhidden)
    tx = optim.make_optimizer(1e-4)

    results = {}
    for nd in device_counts:
        if nd > len(jax.devices()):
            continue
        schedules = build_batch(nd * windows_per_device)
        edges = sum(_live_edges(ws) for ws in schedules)
        sbatch = batch_schedules(schedules, 1024, 12)
        mesh = make_mesh({"data": nd}, jax.devices()[:nd])
        params = mpnn.init_params(jax.random.key(0), cfg)
        stats = mpnn.init_batch_stats(cfg)
        opt_state = tx.init(params)
        step = make_sharded_train_step(mesh, cfg, tx, True)
        state = [params, stats, opt_state]

        def one():
            state[0], state[1], state[2], loss, _ = step(
                state[0], state[1], state[2], sbatch)
            return loss

        dt = _timed(one, repeats)
        results[nd] = {"edges_per_sec": edges / dt, "step_ms": dt * 1000}

    base = None
    for nd in sorted(results):
        eps = results[nd]["edges_per_sec"]
        if base is None:
            base = eps / nd
        results[nd]["efficiency"] = eps / (nd * base)
    return results


def measure_block(device_counts: List[int], windows_per_device: int = 2,
                  repeats: int = 10, nhidden: int = 64) -> dict:
    """Weak-scaling of the PRODUCTION path: the block-structured step
    shard_map'd over a data mesh (parallel/block_parallel.py), fused
    kernels off-TPU-safe (they only engage on the TPU backend)."""
    import jax

    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.parallel import make_mesh
    from trackmpnn_tpu.parallel.block_parallel import make_sharded_block_step
    from trackmpnn_tpu.train import optim
    from trackmpnn_tpu.train.block import build_block_batch

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=nhidden)
    tx = optim.make_optimizer(1e-4)
    fused = jax.default_backend() == "tpu"

    results = {}
    for nd in device_counts:
        if nd > len(jax.devices()):
            continue
        schedules = build_batch(nd * windows_per_device)
        edges = sum(_live_edges(ws) for ws in schedules)
        bb = build_block_batch(schedules, 12)
        mesh = make_mesh({"data": nd}, jax.devices()[:nd])
        params = mpnn.init_params(jax.random.key(0), cfg)
        stats = mpnn.init_batch_stats(cfg)
        opt_state = tx.init(params)
        step = make_sharded_block_step(mesh, cfg, tx, True, fused=fused)
        state = [params, stats, opt_state]

        def one():
            state[0], state[1], state[2], loss, _ = step(
                state[0], state[1], state[2], bb)
            return loss

        dt = _timed(one, repeats)
        results[nd] = {"edges_per_sec": edges / dt, "step_ms": dt * 1000}

    base = None
    for nd in sorted(results):
        eps = results[nd]["edges_per_sec"]
        if base is None:
            base = eps / nd
        results[nd]["efficiency"] = eps / (nd * base)
    return results


def measure_time_shard(device_counts: List[int], repeats: int = 10,
                       nhidden: int = 64, cap: int = 8192, frames: int = 24,
                       tracks: int = 16) -> dict:
    """Strong-scaling of the halo-exchange time-sharded window forward:
    ONE window's slot axis is split across devices (same total work at
    every device count), so efficiency = t_1 / (t_P) with ideal 1/P
    compute per device + boundary-sized comm.  Also reports the plan's
    comm volume vs the full-window all_gather it replaced."""
    import jax

    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.graph.schedule import build_window_schedule
    from trackmpnn_tpu.models import mpnn
    from trackmpnn_tpu.parallel import make_mesh
    from trackmpnn_tpu.parallel.time_shard import (
        build_halo_plan, make_time_sharded_window)
    import jax.numpy as jnp

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=nhidden)
    feats, bp, _ = make_sequence(num_tracks=tracks, num_frames=frames,
                                 seed=77, miss_rate=0.05, fp_rate=0.1)
    ws = build_window_schedule(feats, bp[:, :2].astype(np.int64), cap=cap,
                               t_cap=frames + 2)
    edges = _live_edges(ws)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)

    results = {}
    for nd in device_counts:
        if nd > len(jax.devices()) or cap % nd:
            continue
        plan = build_halo_plan(ws.is_det, ws.past, ws.fut, nd)
        mesh = make_mesh({"time": nd}, jax.devices()[:nd])
        fwd = make_time_sharded_window(mesh, cfg, n_steps=len(ws.n_before))
        args = (params, stats, jnp.asarray(ws.is_det),
                jnp.asarray(plan.past_ext), jnp.asarray(plan.fut_ext),
                jnp.asarray(ws.feat), jnp.asarray(ws.n_before),
                jnp.asarray(ws.n_after), jnp.asarray(plan.send_idx),
                jnp.asarray(plan.send_valid))
        dt = _timed(lambda: fwd(*args)[0], repeats)
        results[nd] = {
            "edges_per_sec": edges / dt,
            "step_ms": dt * 1000,
            "halo_rows": plan.comm_rows,
            "halo_bytes_round": plan.comm_bytes_per_round(nhidden),
            "allgather_bytes_round": cap * nhidden * 4 * 2,
        }

    t1, nd1 = None, None
    for nd in sorted(results):
        if t1 is None:
            t1, nd1 = results[nd]["step_ms"], nd
        # strong scaling: speedup over the smallest measured count,
        # normalized by the ideal 1/P compute split
        results[nd]["speedup"] = t1 / results[nd]["step_ms"]
        results[nd]["efficiency"] = (t1 / results[nd]["step_ms"]) / (nd / nd1)

    # zero-collective control: identical per-row GRU work, NO exchange.
    # On real chips this scales ~1/P; on the forced-host CPU mesh all
    # "devices" share one core pool, so whatever efficiency the control
    # loses is host contention, not halo-exchange cost.
    ctrl = _measure_nocomm_control(
        [nd for nd in device_counts if nd <= len(jax.devices()) and cap % nd == 0],
        cap, len(ws.n_before), nhidden, repeats)
    for nd, ms in ctrl.items():
        if nd in results:
            results[nd]["control_ms"] = ms
            results[nd]["control_speedup"] = ctrl[min(ctrl)] / ms
    return results


def _measure_nocomm_control(device_counts, cap, n_steps, nhidden, repeats):
    """shard_map'd scan of a GRU cell over 1/P of `cap` rows with zero
    collectives - the pure-compute strong-scaling ceiling of the mesh."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from trackmpnn_tpu.models import nn
    from trackmpnn_tpu.parallel import make_mesh

    params = nn.gru_init(jax.random.key(1), nhidden, nhidden)
    out = {}
    for nd in device_counts:
        mesh = make_mesh({"time": nd}, jax.devices()[:nd])

        def body(p, x):
            def step(h, _):
                return nn.gru_cell(p, x, h), None

            h, _ = jax.lax.scan(step, x, None, length=n_steps)
            return h

        fwd = jax.jit(shard_map(body, mesh=mesh, in_specs=(P(), P("time")),
                                out_specs=P("time"), check_vma=False))
        x = jax.random.normal(jax.random.key(2), (cap, nhidden))
        out[nd] = _timed(lambda: fwd(params, x), repeats) * 1000
    return out


def _live_edges(ws) -> int:
    edge_pos = np.where(~ws.is_det[: ws.n_rows])[0]
    return int(sum(np.sum(edge_pos < ws.n_after[s]) for s in range(ws.n_steps)))


def main(argv=None):
    import argparse

    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--time-shard", action="store_true", default=False,
                   help="strong-scale ONE window's slot axis (halo "
                        "exchange) instead of weak-scaling data parallel")
    p.add_argument("--block", action="store_true", default=False,
                   help="weak-scale the production block-structured step "
                        "(shard_map data mesh, parallel/block_parallel.py)")
    args = p.parse_args(argv)
    counts = args.devices
    if counts is None:
        counts, c = [], 1
        while c <= len(jax.devices()):
            counts.append(c)
            c *= 2
    if args.time_shard:
        res = measure_time_shard(counts, repeats=args.repeats)
    elif args.block:
        res = measure_block(counts, repeats=args.repeats)
    else:
        res = measure(counts, repeats=args.repeats)
    print(json.dumps(res, indent=2, default=float))
    return res


if __name__ == "__main__":
    main()
