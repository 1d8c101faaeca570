"""BDD100K converged-training parity vs the ACTUAL reference (round-4
task; the BDD twin of round-2's KITTI experiment in docs/RESULTS.md).

Builds one synthetic BDD tree (real JPEGs, 8-class dict semantics, crowd
+ distractor GT rows and junk detections exercising the reference's
IoM/IoU removal at bdd100k_mot.py:416-469, score>0.8 load threshold),
then trains BOTH implementations on it with the same recipe/seed:

  * /root/reference/train.py (unmodified, via tools/run_reference_train)
  * trackmpnn_tpu.cli.train

and reports per-epoch val MOTA bands + deterministic mAP.

  nohup python tools/run_bdd_parity.py > logs/bdd_parity.log 2>&1 &
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_tree(root, num_seqs, num_frames):
    from trackmpnn_tpu.data.synthetic import write_bdd_tree

    write_bdd_tree(root, num_seqs=num_seqs, num_frames=num_frames,
                   num_tracks=6, miss_rate=0.05, fp_rate=0.05, seed=0)
    write_bdd_tree(root, num_seqs=max(num_seqs // 4, 2),
                   num_frames=num_frames, num_tracks=6, miss_rate=0.05,
                   fp_rate=0.05, seed=100, split_dir="validation")
    print("tree:", root, flush=True)


def parse_motas(text):
    return [float(m) for m in re.findall(r"MOTA\s*=\s*([-\d.]+)\s*%", text)]


def parse_maps(text):
    return [float(m) for m in re.findall(r"mAP\s*=\s*([-\d.]+)\s*%", text)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--num-seqs", type=int, default=12)
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--tree", default="/tmp/bdd_parity/bdd")
    p.add_argument("--out", default="/tmp/bdd_parity")
    p.add_argument("--skip-ref", action="store_true")
    p.add_argument("--skip-ours", action="store_true")
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--batch-windows", type=int, default=2,
                   help="ours-side windows/update; 1 matches the "
                        "reference's one-update-per-window schedule")
    args = p.parse_args()

    if not os.path.exists(args.tree):
        build_tree(args.tree, args.num_seqs, args.num_frames)

    recipe = ["--feats", "2d", "--cur-win-size", "5", "--no-tp-classifier",
              "--epochs", str(args.epochs), "--seed", str(args.seed)]

    if not args.skip_ref:
        t0 = time.time()
        ref_out = os.path.join(args.out, "ref_exp")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "run_reference_train.py"),
             "--tree", args.tree, "--output-dir", ref_out,
             "--dataset", "bdd100k", "--epochs", str(args.epochs),
             "--seed", str(args.seed)],
            capture_output=True, text=True, timeout=6 * 3600)
        open(os.path.join(args.out, "ref_stdout.log"), "w").write(
            r.stdout + "\n--- stderr ---\n" + r.stderr)
        print(f"reference train rc={r.returncode} wall={time.time()-t0:.0f}s",
              flush=True)
        log = os.path.join(ref_out, "logs.txt")
        if os.path.exists(log):
            txt = open(log).read()
            print("ref MOTA per epoch:", parse_motas(txt), flush=True)
            print("ref mAP per epoch:", parse_maps(txt), flush=True)

    if not args.skip_ours:
        t0 = time.time()
        ours_out = os.path.join(args.out, "ours_exp")
        env = dict(os.environ, JAX_PLATFORMS_FORCE_CPU="1")
        code = (
            "import sys; sys.path.insert(0, %r);"
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from trackmpnn_tpu.cli import train as t;"
            "t.main(%r)"
        ) % (REPO, ["--dataset", "bdd100k", "--dataset-root-path", args.tree,
                    "--output-dir", ours_out, "--category", "All",
                    "--detections", "libra",
                    "--batch-windows", str(args.batch_windows)] + recipe)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=6 * 3600)
        open(os.path.join(args.out, "ours_stdout.log"), "w").write(
            r.stdout + "\n--- stderr ---\n" + r.stderr)
        print(f"ours train rc={r.returncode} wall={time.time()-t0:.0f}s",
              flush=True)
        log = os.path.join(ours_out, "logs.txt")
        if os.path.exists(log):
            txt = open(log).read()
            print("ours MOTA per epoch:", parse_motas(txt), flush=True)
            print("ours mAP per epoch:", parse_maps(txt), flush=True)


if __name__ == "__main__":
    main()
