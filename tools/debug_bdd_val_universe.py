"""Pin the 0.09-point BDD val mAP gap (ref 94.32 vs ours 94.41 on the
parity tree, flat across epochs both sides): compare the VAL detection /
GT universes element-wise between the reference BDD100kMOTDataset and
ours, then re-run BOTH mAP implementations on the SAME (ref-loaded)
tensors to separate loader differences from metric differences.

  python tools/debug_bdd_val_universe.py

NOT IMPORTABLE: this script patches the global numpy namespace (np.str)
and leaves reference modules cached in sys.modules — run it standalone
only (the guard below refuses import).
"""

import os
import sys
import types

if __name__ != "__main__":
    raise ImportError("debug_bdd_val_universe.py is a standalone script: "
                      "it monkey-patches numpy (np.str) and sys.modules; "
                      "do not import it from tests or other tools")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools", "refshim"))

import numpy as np
import PIL.Image  # ref does `import PIL` + PIL.Image.open

# the reference's metrics.py uses the numpy<1.20 np.str alias
if not hasattr(np, "str"):
    np.str = str

import torch_dcn_oracle

_pkg = types.ModuleType("models.dla.DCNv2")
_pkg.__path__ = []
_mod = types.ModuleType("models.dla.DCNv2.dcn_v2")
_mod.DCN = torch_dcn_oracle.DCN
sys.modules["models.dla.DCNv2"] = _pkg
sys.modules["models.dla.DCNv2.dcn_v2"] = _mod

import jax

jax.config.update("jax_platforms", "cpu")

TREE = os.environ.get("BDD_TREE", "/tmp/bdd_parity/bdd")


def main():
    sys.path.insert(0, "/root/reference")
    from dataset.bdd100k_mot import BDD100kMOTDataset as RefBDD
    from utils.metrics import compute_map as ref_compute_map
    sys.path.remove("/root/reference")

    from trackmpnn_tpu.data.bdd100k import BDD100kMOTDataset as OursBDD
    from trackmpnn_tpu.eval.detection import compute_map as ours_compute_map

    ref = RefBDD(TREE, "val", "All", "libra", "2d",
                 None, 5, 5, None, False, False)
    ours = OursBDD(TREE, "val", "All", "libra", "2d",
                   cur_win_size=5, ret_win_size=5)
    print("ref len:", len(ref), "ours len:", len(ours))

    pred_ref, gt_ref = {}, {}
    pred_ours, gt_ours = {}, {}
    for i in range(len(ref)):
        _, bp_r, bg_r, _ = ref[i]
        bp_r = np.asarray(bp_r)
        bg_r = np.asarray(bg_r)
        _, bp_o, bg_o, _ = ours[i]
        bp_o, bg_o = np.asarray(bp_o), np.asarray(bg_o)
        same_pred = bp_r.shape == bp_o.shape and np.allclose(
            bp_r[:, 2:], bp_o[:, 2:], atol=1e-4)
        same_gt = bg_r.shape == bg_o.shape and np.allclose(
            bg_r[:, 2:], bg_o[:, 2:], atol=1e-4)
        print(f"seq {i}: pred {bp_r.shape} vs {bp_o.shape} same={same_pred} "
              f"| gt {bg_r.shape} vs {bg_o.shape} same={same_gt}")
        if not same_pred and bp_r.shape == bp_o.shape:
            d = np.abs(bp_r[:, 2:] - bp_o[:, 2:]).max(axis=0)
            print("   pred col max abs diff:", np.round(d, 4))
        if not same_gt and bg_r.shape == bg_o.shape:
            d = np.abs(bg_r[:, 2:] - bg_o[:, 2:]).max(axis=0)
            print("   gt col max abs diff:", np.round(d, 4))

        # everything-tracked oracle: y_out gives each det its own id
        y_pred = bp_r[:, :2].astype("int64")
        y_gt = bg_r[:, :2].astype("int64")
        y_out = np.stack([y_pred[:, 0],
                          np.arange(len(y_pred), dtype=np.int64)], axis=1)
        pred_ref[str(i)] = (y_out, bp_r[:, 2:].astype("float32"))
        gt_ref[str(i)] = (y_gt, bg_r[:, 2:].astype("float32"))
        y_out_o = np.stack([bp_o[:, 0].astype(np.int64),
                            np.arange(len(bp_o), dtype=np.int64)], axis=1)
        pred_ours[str(i)] = (y_out_o, bp_o[:, 2:].astype("float32"))
        gt_ours[str(i)] = (bg_o[:, :2].astype("int64"),
                           bg_o[:, 2:].astype("float32"))

    # 2x2: {ref loader, ours loader} x {ref metric, ours metric}
    print("ref-metric(ref-load):  %.4f" % (100 * ref_compute_map(pred_ref, gt_ref)))
    print("ours-metric(ref-load): %.4f" % (100 * ours_compute_map(pred_ref, gt_ref)))
    print("ref-metric(ours-load): %.4f" % (100 * ref_compute_map(pred_ours, gt_ours)))
    print("ours-metric(ours-load):%.4f" % (100 * ours_compute_map(pred_ours, gt_ours)))


if __name__ == "__main__":
    main()
