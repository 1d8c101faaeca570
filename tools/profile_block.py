"""Per-op device profile of the block train step (fused/XLA, f32/bf16).

Prints the top-K ops by total device time from the "XLA Ops" thread of a
jax.profiler trace, aggregated by fusion name prefix — the tool that tells
us WHERE the next millisecond lives.  Env: FUSED=1/0, BF16=1/0, NSTEPS.

Run ONE at a time: nohup python tools/profile_block.py > /tmp/prof_block.log 2>&1 &
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # warm tunnel compiles across runs

import bench
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train import optim
from trackmpnn_tpu.train.block import build_block_batch, make_block_train_step

FUSED = os.environ.get("FUSED", "1") == "1"
BF16 = os.environ.get("BF16", "1") == "1"
DEFER = os.environ.get("DEFER", "1") == "1"
NATT = int(os.environ.get("NATT", "0"))  # GAT attention heads
NSTEPS = int(os.environ.get("NSTEPS", "6"))
TOPK = int(os.environ.get("TOPK", "40"))
# TOP_RAW=1: ALSO rank individual ops (full fusion.N names, no prefix
# aggregation) and print each one's optimized-HLO definition line (root
# expression + shapes) so the top fusions can be attacked by content.
TOP_RAW = os.environ.get("TOP_RAW", "") == "1"


def op_breakdown(trace_dir):
    per_op = collections.Counter()
    count = collections.Counter()
    per_raw = collections.Counter()
    for f in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            events = json.load(fh).get("traceEvents", [])
        dev_pids = {e.get("pid") for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and str((e.get("args") or {}).get("name", "")
                            ).startswith("/device:")}
        op_tracks = {(e.get("pid"), e.get("tid")) for e in events
                     if e.get("ph") == "M" and e.get("name") == "thread_name"
                     and e.get("pid") in dev_pids
                     and (e.get("args") or {}).get("name") == "XLA Ops"}
        for e in events:
            if (e.get("ph") == "X" and "dur" in e
                    and (e.get("pid"), e.get("tid")) in op_tracks):
                raw = e.get("name", "")
                name = re.sub(r"[.\d]+$", "", raw)
                per_op[name] += e["dur"]
                count[name] += 1
                per_raw[raw] += e["dur"]
    return per_op, count, per_raw


def hlo_def_line(hlo_text, op_name):
    """The optimized-HLO definition of `op_name` (root expr + shapes)."""
    m = re.search(r"^\s*(?:ROOT )?%?" + re.escape(op_name) + r"\s*=\s*(.+)$",
                  hlo_text, re.M)
    return m.group(1) if m else "(not found in HLO)"


def main():
    print(f"devices: {jax.devices()}  fused={FUSED} bf16={BF16} "
          f"defer={DEFER} natt={NATT}", flush=True)
    schedules, cap, t_cap = bench.build_workload()
    bb = build_block_batch(schedules, t_cap)
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64,
                           nattheads=NATT)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tx = optim.make_optimizer(1e-4, 5e-4)
    opt = tx.init(params)
    step = make_block_train_step(cfg, tx, tp_classifier=False,
                                 compute_dtype=jnp.bfloat16 if BF16 else None,
                                 fused=FUSED, defer_loss=DEFER,
                                 # keep the raw jit so .lower() works for
                                 # the TOP_RAW HLO dump (the GAT fallback
                                 # wrapper is a plain function)
                                 gat_fallback=False)
    state = [params, stats, opt]

    rng = [jax.random.key(7)] if NATT else None

    def one():
        r = None
        if rng is not None:
            rng[0], r = jax.random.split(rng[0])
        state[0], state[1], state[2], loss, _ = step(state[0], state[1],
                                                     state[2], bb, r)
        return loss

    jax.block_until_ready(one())  # compile
    trace_dir = tempfile.mkdtemp(prefix="tm_prof_")
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(NSTEPS):
            out = one()
        jax.block_until_ready(out)

    per_op, count, per_raw = op_breakdown(trace_dir)
    total = sum(per_op.values())
    print(f"total device op time: {total/NSTEPS/1e3:.2f} ms/step "
          f"({len(per_op)} distinct ops)", flush=True)
    for name, dur in per_op.most_common(TOPK):
        print(f"{dur/NSTEPS/1e3:9.3f} ms/step  x{count[name]//NSTEPS:<5d} {name[:110]}")

    if TOP_RAW:
        print("\n---- top individual ops (HLO definitions) ----", flush=True)
        hlo = step.lower(state[0], state[1], state[2], bb).compile().as_text()
        with open("/tmp/block_hlo.txt", "w") as fh:
            fh.write(hlo)
        for raw, dur in per_raw.most_common(TOPK):
            print(f"{dur/NSTEPS/1e3:9.3f} ms/step  {raw}")
            print(f"           {hlo_def_line(hlo, raw)[:240]}")


if __name__ == "__main__":
    main()
