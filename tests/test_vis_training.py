"""End-to-end joint training with visual embeddings (2d+vis) on a synthetic
KITTI tree with real images."""

import os

import numpy as np
import pytest

from test_datasets import write_kitti_tree


def add_images(root, num_seqs=21, frames=6, hw=(48, 96)):
    import cv2

    rng = np.random.default_rng(0)
    for s in range(num_seqs):
        seq = "%04d" % s
        imdir = os.path.join(root, "training", "image_02", seq)
        for fr in range(frames):
            img = rng.integers(0, 255, (hw[0], hw[1], 3), np.uint8)
            cv2.imwrite(os.path.join(imdir, "%.6d.png" % fr), img)


def test_train_with_vis_features(tmp_path):
    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, frames=6)
    add_images(root)
    out = str(tmp_path / "exp")

    from trackmpnn_tpu.cli import train as cli_train

    history = cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out, "--category", "Car", "--detections", "rrc",
        "--feats", "2d+vis", "--cur-win-size", "4", "--epochs", "1",
        "--num-hidden-feats", "16",
        "--embed-input-h", "32", "--embed-input-w", "64",
    ])
    assert len(history["loss"]) == 1
    assert os.path.exists(os.path.join(out, "vis-net_best.npz"))
    ckpt = os.path.join(out, "track-mpnn_best.npz")

    # inference consumes the vis-net by naming convention
    from test_cli import write_kitti_test_tree

    write_kitti_test_tree(root)
    from trackmpnn_tpu.cli import infer as cli_infer

    out_infer = str(tmp_path / "exp_infer")
    cli_infer.main(["--snapshot", ckpt, "--dataset-root-path", root,
                    "--output-dir", out_infer])
    assert any(f.endswith(".txt") for f in os.listdir(out_infer))


def test_embed_trainer_learns_ids(tmp_path):
    """FairMOT loss must decrease when the same synthetic 'identities'
    recur across frames."""
    import cv2

    from trackmpnn_tpu.train.embed import EmbedTrainer

    imdir = tmp_path / "ims"
    imdir.mkdir()
    rng = np.random.default_rng(1)
    # two distinct texture patches at fixed positions over 4 frames
    patches = [rng.integers(0, 255, (16, 16, 3), np.uint8) for _ in range(2)]
    paths = []
    for fr in range(4):
        img = np.zeros((32, 64, 3), np.uint8)
        img[4:20, 4:20] = patches[0]
        img[4:20, 40:56] = patches[1]
        p = str(imdir / f"{fr}.png")
        cv2.imwrite(p, img)
        paths.append(p)

    et = EmbedTrainer(arch="espv2", num_vis_feats=32, input_hw=(32, 64), max_dets=32)
    vis_meta = {
        "images": [(p, False) for p in paths],
        "centers": [(np.array([12, 12]), np.array([12, 48]))] * 4,
        "counts": [2] * 4,
    }
    tids = np.array([0, 1] * 4, np.int32)
    losses = []
    for _ in range(8):
        feats, loss = et.train_chunk(vis_meta, tids)
        losses.append(loss)
    assert feats.shape == (8, 32)
    assert losses[-1] < losses[0]


def _tiny_chunk(tmp_path, cv2, frames=4):
    imdir = tmp_path / "bn_ims"
    imdir.mkdir()
    rng = np.random.default_rng(3)
    paths = []
    for fr in range(frames):
        img = rng.integers(0, 255, (32, 64, 3), np.uint8)
        p = str(imdir / f"{fr}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    vis_meta = {
        "images": [(p, False) for p in paths],
        "centers": [(np.array([12, 12]), np.array([12, 48]))] * frames,
        "counts": [2] * frames,
    }
    tids = np.array([0, 1] * frames, np.int32)
    return vis_meta, tids


def test_embed_bn_buffers_protected_from_optimizer(tmp_path):
    """BN running buffers live in the params dict but are torch *buffers*:
    Adam + weight decay must never move them (espv2 has wd=5e-4, which
    would silently shrink them toward zero every step)."""
    import cv2

    from trackmpnn_tpu.train.embed import EmbedTrainer

    vis_meta, tids = _tiny_chunk(tmp_path, cv2)
    et = EmbedTrainer(arch="espv2", num_vis_feats=16, input_hw=(32, 64),
                      max_dets=32)
    bufs0 = {k: np.asarray(v).copy() for k, v in et.params.items()
             if ".running_" in k}
    assert bufs0, "espv2 params should contain running buffers"
    w = "net.level1.conv.weight"
    w0 = np.asarray(et.params[w]).copy()
    for _ in range(3):
        et.train_chunk(vis_meta, tids)
    for k, v0 in bufs0.items():
        np.testing.assert_array_equal(np.asarray(et.params[k]), v0, err_msg=k)
    assert not np.allclose(np.asarray(et.params[w]), w0)  # weights DID move


def test_embed_train_bn_updates_buffers(tmp_path):
    """train_bn=True (reference .train() semantics) folds momentum-updated
    running statistics back into params each step and still learns."""
    import cv2

    from trackmpnn_tpu.train.embed import EmbedTrainer

    vis_meta, tids = _tiny_chunk(tmp_path, cv2)
    et = EmbedTrainer(arch="espv2", num_vis_feats=16, input_hw=(32, 64),
                      max_dets=32, train_bn=True)
    bufs0 = {k: np.asarray(v).copy() for k, v in et.params.items()
             if ".running_" in k}
    losses = []
    for _ in range(6):
        _, loss = et.train_chunk(vis_meta, tids)
        losses.append(loss)
    moved = sum(not np.allclose(np.asarray(et.params[k]), v0)
                for k, v0 in bufs0.items())
    assert moved >= len(bufs0) // 2  # nearly all buffers tracked batch stats
    for k in bufs0:
        assert np.all(np.isfinite(np.asarray(et.params[k]))), k
    assert losses[-1] < losses[0]


def test_vis_resume_restores_embed_net(tmp_path):
    """--snapshot resume must restore the embedding net saved next to the
    tracker checkpoint (it used to silently reset to random init)."""
    import numpy as np

    root = str(tmp_path / "kitti")
    write_kitti_tree(root, num_seqs=21, frames=6)
    add_images(root)
    out = str(tmp_path / "exp")

    from trackmpnn_tpu.cli import train as cli_train

    cli_train.main([
        "--dataset", "kitti", "--dataset-root-path", root,
        "--output-dir", out, "--category", "Car", "--detections", "rrc",
        "--feats", "2d+vis", "--cur-win-size", "4", "--epochs", "1",
        "--num-hidden-feats", "16",
        "--embed-input-h", "32", "--embed-input-w", "64",
    ])
    ckpt = os.path.join(out, "track-mpnn_best.npz")

    from trackmpnn_tpu.cli.train import load_vis_net, make_embed_trainer
    from trackmpnn_tpu.utils.config import build_train_parser

    args = build_train_parser().parse_args([
        "--dataset", "kitti", "--feats", "2d+vis",
        "--embed-input-h", "32", "--embed-input-w", "64"])
    embed = make_embed_trainer(args)
    fresh = {k: np.asarray(v) for k, v in embed.params.items()}
    load_vis_net(embed, ckpt)
    # one trained step must have moved SOME weights away from the fresh init
    moved = any(not np.allclose(np.asarray(embed.params[k]), fresh[k])
                for k in fresh)
    assert moved, "vis-net load left the fresh random init untouched"

    # and a missing vis-net beside the snapshot is an explicit error
    import pytest

    with pytest.raises(FileNotFoundError):
        load_vis_net(embed, str(tmp_path / "exp" / "track-mpnn_0000.npz"))


def test_embed_frame_chunk_parity(tmp_path):
    """frame_chunk runs the backbone through a checkpointed lax.map over
    frame chunks (HBM-bounding the DCN backward on TPU); the step's loss
    and parameter updates must match the unchunked batch exactly."""
    import cv2

    from trackmpnn_tpu.train.embed import EmbedTrainer

    vis_meta, tids = _tiny_chunk(tmp_path, cv2, frames=5)
    # dla34 samples a down_ratio=4 feature map: centers are fmap coords
    vis_meta["centers"] = [(cy // 4, cx // 4)
                           for cy, cx in vis_meta["centers"]]
    kw = dict(arch="dla34", num_vis_feats=16, input_hw=(32, 64), max_dets=32,
              seed=7)
    et_full = EmbedTrainer(**kw)
    et_chunk = EmbedTrainer(**kw, frame_chunk=2)  # 5 frames -> 3 chunks + pad
    losses = []
    for et in (et_full, et_chunk):
        feats, loss = et.train_chunk(vis_meta, tids)
        losses.append(loss)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    # Params after one ADAM step: update = lr*m/(sqrt(v)+eps) amplifies
    # reduction-order noise for near-zero-gradient weights (XLA:CPU
    # multi-threaded reductions are run-order dependent), so individual
    # elements wobble ~1e-3 relative while a semantic chunking bug (BN
    # leakage, wrong frame padding) shows up at 1e-1 on many elements.
    for k in et_full.params:
        np.testing.assert_allclose(np.asarray(et_full.params[k]),
                                   np.asarray(et_chunk.params[k]),
                                   rtol=1e-2, atol=1e-4, err_msg=k)

    import pytest

    with pytest.raises(ValueError):
        EmbedTrainer(arch="dla34", train_bn=True, frame_chunk=2)
