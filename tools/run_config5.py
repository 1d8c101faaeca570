"""Config-5 evidence (BASELINE config 5; VERDICT r3 "missing" #2):
train `2d` vs `2d+vis` (espv2, jointly trained embed net) to convergence
on the crossing-pair appearance tree and compare MOTA/IDF1 with
Hungarian decode.

The tree (data/synthetic.write_kitti_tree_appearance) is built so that
appearance is the ONLY reliable disambiguator: each sequence is crossing
track pairs sharing one box size, with an occlusion gap at the crossing
and a distinct per-identity texture rendered into the frames.  A `2d`
model faces an ambiguous re-association at every crossing; the `vis`
branch reads the identity off the pixels (the reference's motivation for
vis feats, /root/reference/dataset/kitti_mot.py:119-132, train.py:136).

Usage (CPU, ~30-60 min at the defaults):
    nohup python tools/run_config5.py > logs/config5.log 2>&1 &
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_variant(name, feats, args, tree, outroot, extra):
    from trackmpnn_tpu.cli import ablation as cli_ablation
    from trackmpnn_tpu.cli import train as cli_train

    out = os.path.join(outroot, name)
    common = [
        "--dataset", "kitti", "--dataset-root-path", tree,
        "--output-dir", out, "--category", "Car", "--detections", "rrc",
        "--feats", feats, "--cur-win-size", "5", "--ret-win-size", "5",
        "--no-tp-classifier", "--hungarian", "--random-transforms",
        "--epochs", str(args.epochs), "--learning-rate", str(args.lr),
        "--seed", "5", "--batch-windows", "2",
    ] + extra
    t0 = time.time()
    cli_train.main(common)
    wall = time.time() - t0
    log = open(os.path.join(out, "logs.txt")).read()
    motas = [float(m) for m in re.findall(r"Validation MOTA = ([-\d.]+)%", log)]
    snap = os.path.join(out, "track-mpnn_best.npz")

    # full metric dump (IDF1 etc.) on the val split with the best ckpt
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_ablation.main([
            "--dataset", "kitti", "--dataset-root-path", tree,
            "--snapshot", snap, "--hungarian", "--seed", "5",
            "--output-dir", os.path.join(out, "ablation"),
        ])
    abl = buf.getvalue()
    print(abl)
    metrics = dict(re.findall(r"^\s*(\w+)\s*[:=]\s*([-\d.]+)", abl, re.M))
    return {"name": name, "feats": feats, "wall_s": round(wall, 1),
            "best_mota": max(motas) if motas else None,
            "last_mota": motas[-1] if motas else None,
            "ablation": metrics}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--num-seqs", type=int, default=21)
    p.add_argument("--num-frames", type=int, default=24)
    p.add_argument("--num-pairs", type=int, default=3)
    p.add_argument("--gap", type=int, default=2)
    p.add_argument("--embed-h", type=int, default=96)
    p.add_argument("--embed-w", type=int, default=320)
    p.add_argument("--tree", type=str, default="/tmp/app_tree/kitti")
    p.add_argument("--out", type=str, default="/tmp/config5")
    p.add_argument("--cpu", action="store_true", default=True)
    p.add_argument("--tpu", dest="cpu", action="store_false")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from trackmpnn_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    from trackmpnn_tpu.data.synthetic import write_kitti_tree_appearance

    if not os.path.exists(args.tree):
        write_kitti_tree_appearance(
            args.tree, num_seqs=args.num_seqs, num_frames=args.num_frames,
            num_pairs=args.num_pairs, gap=args.gap)
        print("tree built:", args.tree, flush=True)

    results = []
    results.append(run_variant("2d", "2d", args, args.tree, args.out, []))
    print(json.dumps(results[-1]), flush=True)
    results.append(run_variant(
        "2d_vis", "2d+vis", args, args.tree, args.out,
        ["--embed-arch", "espv2", "--embed-input-h", str(args.embed_h),
         "--embed-input-w", str(args.embed_w)]))
    print(json.dumps(results[-1]), flush=True)

    print("\n=== config-5 table ===")
    for r in results:
        a = r["ablation"]
        print(f"{r['feats']:8s} best_MOTA={r['best_mota']} "
              f"IDF1={a.get('idf1')} MOTA={a.get('mota')} "
              f"IDS={a.get('num_switches')} wall={r['wall_s']}s")


if __name__ == "__main__":
    main()
