"""Run the ACTUAL reference training script (/root/reference/train.py) on a
synthetic KITTI tree, on CPU.

This is the converged-training parity harness (VERDICT round-1 item 7): the
closest achievable proxy for BASELINE's "match reference-trained MOTA" given
no real KITTI data in this environment.  The reference's train loop, model,
losses, dataset, and graph code all run unmodified; only `motmetrics` (not
installed here) is satisfied by tools/refshim — our canonical-semantics
oracle (tests/motmetrics_oracle.py).

Usage:
    python tools/run_reference_train.py --tree /tmp/ptree/kitti \
        --output-dir /tmp/ref_exp --epochs 15 [extra reference args...]

Extra args are passed through to the reference argparse
(/root/reference/utils/training_options.py).
"""

from __future__ import annotations

import argparse
import os
import random
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tree", required=True, help="dataset tree root (training/...)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dataset", default="kitti", choices=["kitti", "bdd100k"])
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--seed", type=int, default=5)
    args, extra = p.parse_known_args(argv)

    # matplotlib Agg before the reference imports pyplot (train.py:3-4 does
    # this itself, but be explicit for any backend probing on import)
    os.environ.setdefault("MPLBACKEND", "Agg")

    # Resolution order: reference packages first (utils/, models/, dataset/),
    # then the motmetrics shim, then our tests dir (for the oracle module).
    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, os.path.join(REPO, "tools", "refshim"))
    sys.path.insert(0, REF)

    # The reference's BDD dataset module imports the DCNv2 CUDA extension at
    # module scope (models/dla/pose_dla_dcn.py:16) even for KITTI runs; serve
    # our pure-torch oracle (tests/torch_dcn_oracle.py) under that name.
    import types

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch_dcn_oracle

    pkg = types.ModuleType("models.dla.DCNv2")
    pkg.__path__ = []
    mod = types.ModuleType("models.dla.DCNv2.dcn_v2")
    mod.DCN = torch_dcn_oracle.DCN
    sys.modules["models.dla.DCNv2"] = pkg
    sys.modules["models.dla.DCNv2.dcn_v2"] = mod

    # Upstream bug: the shipped reference train.py cannot run as-is —
    # TrackMPNN.forward returns 4 values (models/track_mpnn.py:75, the
    # attention map added last) while train.py unpacks 3 (train.py:68,107).
    # Minimal intervention: drop the attention output (train.py never
    # consumes it).  This is the same 4-vs-3 arity bug our model API fixed
    # structurally (trackmpnn_tpu/models/mpnn.py).
    import models.track_mpnn as _ref_mpnn

    _orig_forward = _ref_mpnn.TrackMPNN.forward

    def _forward3(self, *a, **k):
        out = _orig_forward(self, *a, **k)
        if isinstance(out, tuple) and len(out) == 4:
            return out[:3]
        return out

    _ref_mpnn.TrackMPNN.forward = _forward3

    # The reference seeds only torch (train.py:42-45); its dataset chunking
    # uses the global `random` module (dataset/kitti_mot.py:225) — seed it
    # for reproducible chunk layouts.
    random.seed(args.seed)
    import numpy as np

    np.random.seed(args.seed)

    # The reference targets numpy<1.24 (np.str at utils/metrics.py:100 etc.);
    # restore the removed builtin aliases so it runs on this numpy unmodified.
    for _name, _alias in [("str", str), ("int", int), ("float", float),
                          ("bool", bool), ("object", object)]:
        if not hasattr(np, _name):
            setattr(np, _name, _alias)

    if args.dataset == "kitti":
        defaults = ["--category", "Car", "--detections", "rrc"]
    else:
        # the reference's BDD recipe (README.md:113) minus the vis branch
        # (its espv2 requires the unavailable ImageNet weights file)
        defaults = ["--category", "All", "--detections", "libra"]
    sys.argv = [
        "train.py",
        "--dataset", args.dataset,
        "--dataset-root-path", args.tree,
        "--output-dir", args.output_dir,
        "--feats", "2d",
        "--cur-win-size", "5",
        "--no-tp-classifier",
        "--epochs", str(args.epochs),
        "--seed", str(args.seed),
        "--no-cuda",
    ] + defaults + extra

    runpy.run_path(os.path.join(REF, "train.py"), run_name="__main__")


if __name__ == "__main__":
    main()
