"""Auxiliary subsystems: embedding losses, visualization, profiling,
attention collection."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from trackmpnn_tpu.losses.embedding import discriminative_embedding_loss, fairmot_id_loss


def test_fairmot_loss_matches_torch(rng):
    n, c = 20, 8
    feats = rng.normal(size=(n, c)).astype(np.float32)
    ids = rng.integers(-1, 12, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    got = float(fairmot_id_loss(jnp.asarray(feats), jnp.asarray(ids),
                                jnp.asarray(valid), c))
    target = np.where(ids >= 0, ids % c, -100)
    want = float(torch.nn.functional.cross_entropy(
        torch.tensor(feats), torch.tensor(target.astype(np.int64)),
        ignore_index=-100))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fairmot_loss_all_fp():
    feats = jnp.zeros((4, 8))
    ids = jnp.full((4,), -1, jnp.int32)
    assert float(fairmot_id_loss(feats, ids, jnp.ones(4, bool), 8)) == 0.0


def test_discriminative_embedding_loss_properties(rng):
    # two tight clusters far apart -> near-zero loss
    f = np.concatenate([
        rng.normal(0, 0.01, size=(5, 4)) + np.array([20, 0, 0, 0]),
        rng.normal(0, 0.01, size=(5, 4)) - np.array([20, 0, 0, 0]),
    ]).astype(np.float32)
    ids = np.array([0] * 5 + [1] * 5, np.int32)
    loss = float(discriminative_embedding_loss(
        jnp.asarray(f), jnp.asarray(ids), jnp.ones(10, bool), 8))
    assert loss < 1e-3
    # identical cluster means -> push term dominates
    f2 = rng.normal(0, 0.01, size=(10, 4)).astype(np.float32)
    loss2 = float(discriminative_embedding_loss(
        jnp.asarray(f2), jnp.asarray(ids), jnp.ones(10, bool), 8))
    assert loss2 > 50


def test_grad_flow_plot(tmp_path):
    from trackmpnn_tpu.eval.visualize import plot_grad_flow

    tree = {"layer1": {"w": np.ones((3, 3)), "b": np.zeros(3)},
            "layer2": {"w": 2 * np.ones((4, 4))}}
    out = plot_grad_flow([tree], str(tmp_path / "g.jpg"))
    assert os.path.exists(out)


def test_render_video(tmp_path):
    import cv2

    from trackmpnn_tpu.eval.visualize import render_sequence_video

    imdir = tmp_path / "seq"
    imdir.mkdir()
    for fr in range(3):
        cv2.imwrite(str(imdir / ("%06d.png" % fr)), np.zeros((100, 200, 3), np.uint8))
    res = tmp_path / "0000.txt"
    with open(res, "w") as f:
        f.write("0 1 Car -1 -1 0 10 10 50 50 0 0 0 0 0 0 0 0.9\n")
        f.write("1 1 Car -1 -1 0 15 10 55 50 0 0 0 0 0 0 0 0.9\n")
    out = render_sequence_video(str(res), str(imdir), str(tmp_path / "out.mp4"),
                                size=(200, 100))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_throughput_meter():
    from trackmpnn_tpu.utils.profiling import Throughput

    m = Throughput()
    m.start()
    m.stop(edges=1000, graphs=2, steps=10)
    assert m.edges_per_sec > 0
    assert "edges_per_sec" in m.report()


def test_attention_collection_on_tracker():
    from trackmpnn_tpu.data.synthetic import make_sequence
    from trackmpnn_tpu.decode import Tracker, TrackerConfig
    from trackmpnn_tpu.models import mpnn

    cfg = mpnn.ModelConfig(features="2d", ncategories=3, nhidden=16, nattheads=2)
    params = mpnn.init_params(jax.random.key(0), cfg)
    stats = mpnn.init_batch_stats(cfg)
    tracker = Tracker(params, stats, cfg, TrackerConfig(bucket=128))
    feats, bp, _ = make_sequence(num_tracks=3, num_frames=5, seed=3)
    seen = []

    def on_step(g, scores2):
        assert tracker.last_attention is not None
        for branch in tracker.last_attention:
            assert len(branch) == 2  # heads
            seen.append(branch[0].shape)

    tracker.run(feats, bp[:, :2].astype(np.int64), on_step=on_step)
    assert seen and all(s[0] % 2 == 0 for s in seen)
