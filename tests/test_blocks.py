"""Bipartite block descriptors must exactly reconstruct the schedule's
edge-endpoint arrays - the foundation for scatter-free block reductions."""

import numpy as np
import pytest

from trackmpnn_tpu.data.synthetic import make_sequence
from trackmpnn_tpu.graph.schedule import build_window_schedule


@pytest.mark.parametrize("seed", range(5))
def test_blocks_reconstruct_endpoints(seed):
    feats, bp, _ = make_sequence(num_tracks=5, num_frames=8, seed=seed,
                                 miss_rate=0.15, fp_rate=0.2)
    ws = build_window_schedule(feats, bp[:, :2].astype(np.int64), bucket=64)
    if ws is None:
        return
    assert len(ws.blocks) == ws.n_steps
    past = np.full(ws.n_rows, -1, np.int64)
    fut = np.full(ws.n_rows, -1, np.int64)
    edge_rows = 0
    for blk in ws.blocks:
        if blk is None:
            continue
        for i in range(blk.na):
            for j in range(blk.nt):
                e = blk.edge_base + i * blk.nt + j
                past[e] = blk.active_rows[i]
                fut[e] = blk.det_base + j
                edge_rows += 1
    er = np.where(~ws.is_det[: ws.n_rows])[0]
    assert edge_rows == len(er)
    np.testing.assert_array_equal(past[er], ws.past[er])
    np.testing.assert_array_equal(fut[er], ws.fut[er])
    # det rows are untouched by any block's edge range
    assert np.all(past[ws.is_det[: ws.n_rows]] == -1)
