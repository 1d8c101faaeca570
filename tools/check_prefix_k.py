"""On-chip K=T numerics pin (VERDICT r4 task #4): loss AND grads at the
TPU production prefix-segment count (K=min(T,16)) must match K=1 (single
full-width scan) and K=4 at bench shapes (B=8, cap 4096, T=16).

Every earlier K sweep recorded only ms/step; this asserts the segment-
boundary carry handoff is numerically exact where it actually runs.  Two
configs per K: the production one (fused round, bf16, defer-loss — loose
tolerance, bf16 reassociation differs across segment boundaries) and the
plain f32 XLA path (tight tolerance).

  nohup python tools/check_prefix_k.py > logs/check_prefix_k.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trackmpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench
from trackmpnn_tpu.models import mpnn
from trackmpnn_tpu.train.block import block_window_forward, build_block_batch


def run_cfg(bb, *, fused, dtype, defer, k):
    os.environ["TM_PREFIX_K"] = str(k)
    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=64)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)

    @jax.jit
    def f(p):
        return block_window_forward(p, stats, cfg, bb, False, fused=fused,
                                    compute_dtype=dtype, defer_loss=defer)

    (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
    jax.block_until_ready(loss)
    return (float(loss), {k_: int(aux[k_]) for k_ in ("tp", "fp", "fn")},
            jax.tree_util.tree_map(np.asarray, grads))


def compare(tag, base, other, rtol):
    """|x-y| <= atol + rtol'*|y| elementwise (the tests' _assert_tree_close
    contract): without the absolute floor, noise on near-zero grad elements
    reads as O(1) relative error (the first on-chip capture did exactly
    that).  atol scales with each leaf's magnitude so big-grad leaves get a
    proportional floor."""
    l0, a0, g0 = base
    l1, a1, g1 = other
    ok = True
    if not np.isclose(l1, l0, rtol=rtol):
        print(f"{tag}: LOSS MISMATCH {l1} vs {l0}")
        ok = False
    if a1 != a0:
        print(f"{tag}: AUX MISMATCH {a1} vs {a0}")
        ok = False
    worst = 0.0   # worst violation factor of the atol+rtol envelope
    worst_abs = 0.0
    rtol_g = rtol * 30
    # atol floors on the GLOBAL gradient scale: leaves whose true grad is
    # ~0 (e.g. lin1.b — BN right after cancels the bias exactly) carry
    # pure f32 reassociation noise at any K; per-leaf floors flagged them
    # at x4000 "violations" with absolute diffs of 1e-6 of the gradient
    # magnitude (logs/check_prefix_k2.log)
    gscale = max(float(np.max(np.abs(y)))
                 for y in jax.tree_util.tree_leaves(g0))
    atol = 1e-5 * gscale
    for x, y in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        viol = np.abs(x - y) / (atol + rtol_g * np.abs(y))
        worst = max(worst, float(np.max(viol)))
        worst_abs = max(worst_abs, float(np.max(np.abs(x - y))))
    if worst > 1.0:
        print(f"{tag}: GRAD MISMATCH envelope violation x{worst:.2f}")
        ok = False
    print(f"{tag}: {'OK' if ok else 'FAIL'} loss={l1:.6f} "
          f"worst_env={worst:.3f} worst_abs={worst_abs:.3e}", flush=True)
    return ok


def main():
    print("devices:", jax.devices(), flush=True)
    schedules, cap, t_cap = bench.build_workload()
    bb = build_block_batch(schedules, t_cap)
    all_ok = True
    for fused, dtype, defer, rtol, name in (
            (True, jnp.bfloat16, True, 2e-2, "prod(fused,bf16,defer)"),
            (False, None, False, 1e-4, "xla(f32)")):
        base = run_cfg(bb, fused=fused, dtype=dtype, defer=defer, k=1)
        print(f"{name} K=1: loss={base[0]:.6f} aux={base[1]}", flush=True)
        # determinism control: a fresh jit of the SAME program bounds the
        # noise floor any K comparison sits on (TPU reduction order)
        rpt = run_cfg(bb, fused=fused, dtype=dtype, defer=defer, k=1)
        compare(f"{name} K=1 vs K=1 (fresh jit, noise floor)", base, rpt,
                rtol)
        for k in (4, 16):
            other = run_cfg(bb, fused=fused, dtype=dtype, defer=defer, k=k)
            all_ok &= compare(f"{name} K={k} vs K=1", base, other, rtol)
    print("ALL OK" if all_ok else "FAILURES PRESENT", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
