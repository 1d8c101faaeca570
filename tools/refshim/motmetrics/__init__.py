"""Drop-in `motmetrics` shim for running the ACTUAL reference code.

The reference delegates all MOT metrics to py-motmetrics
(/root/reference/utils/metrics.py:2,26,43,60-62), which is not installed
in this environment.  This shim exposes the exact API surface the
reference consumes — `MOTAccumulator`, `distances.iou_matrix`,
`metrics.create().compute_many(...)`, `metrics.motchallenge_metrics` —
backed by tests/motmetrics_oracle.py, our independent event-log
transcription of the canonical algorithm (fuzz-pinned against
trackmpnn_tpu/eval/mot.py in tests/test_metrics_oracle.py).

Used ONLY by tools/run_reference_train.py (converged-training parity,
VERDICT round-1 item 7); never importable from the library itself.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

_TESTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))),
    "tests",
)
if _TESTS_DIR not in sys.path:
    sys.path.insert(0, _TESTS_DIR)

from motmetrics_oracle import OracleAccumulator, oracle_summarize  # noqa: E402


class MOTAccumulator(OracleAccumulator):
    """py-motmetrics-compatible accumulator (frameid accepted like the
    reference passes it, utils/metrics.py:43)."""

    def update(self, oids, hids, dists, frameid=None):  # noqa: D102
        if frameid is not None:
            self.frame = int(frameid)
        return super().update(oids, hids, dists)


def _iou_xywh(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU for (x, y, w, h) boxes (py-motmetrics box convention)."""
    a = np.asarray(a, dtype=float).reshape(-1, 4)
    b = np.asarray(b, dtype=float).reshape(-1, 4)
    ax1, ay1 = a[:, 0], a[:, 1]
    ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx1, by1 = b[:, 0], b[:, 1]
    bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = np.maximum(
        0.0, np.minimum(ax2[:, None], bx2[None, :]) - np.maximum(ax1[:, None], bx1[None, :])
    )
    iy = np.maximum(
        0.0, np.minimum(ay2[:, None], by2[None, :]) - np.maximum(ay1[:, None], by1[None, :])
    )
    inter = ix * iy
    area_a = np.maximum(0.0, a[:, 2]) * np.maximum(0.0, a[:, 3])
    area_b = np.maximum(0.0, b[:, 2]) * np.maximum(0.0, b[:, 3])
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def iou_matrix(objs, hyps, max_iou: float = 1.0) -> np.ndarray:
    """1 - IoU distance with entries above `max_iou` masked to NaN
    (py-motmetrics distances.iou_matrix semantics; consumed at
    /root/reference/utils/metrics.py:40)."""
    objs = np.asarray(objs, dtype=float)
    hyps = np.asarray(hyps, dtype=float)
    if objs.size == 0 or hyps.size == 0:
        return np.empty((objs.reshape(-1, 4).shape[0], hyps.reshape(-1, 4).shape[0]))
    d = 1.0 - _iou_xywh(objs, hyps)
    return np.where(d > max_iou, np.nan, d)


distances = types.SimpleNamespace(iou_matrix=iou_matrix)


motchallenge_metrics = [
    "idf1", "idp", "idr", "recall", "precision", "num_unique_objects",
    "mostly_tracked", "partially_tracked", "mostly_lost",
    "num_false_positives", "num_misses", "num_switches",
    "num_fragmentations", "mota", "motp",
]


class _Summary:
    """Just enough of the pandas DataFrame surface the reference touches
    (`summary.to_dict('records')`, /root/reference/utils/metrics.py:62)."""

    def __init__(self, records):
        self._records = records

    def to_dict(self, orient: str = "records"):
        assert orient == "records"
        return self._records


class _MetricsHost:
    def compute_many(self, accs, metrics=None, names=None, generate_overall=False):
        records = [oracle_summarize([acc]) for acc in accs]
        if generate_overall:
            records.append(oracle_summarize(list(accs)))
        return _Summary(records)


def _create():
    return _MetricsHost()


metrics = types.SimpleNamespace(
    create=_create, motchallenge_metrics=motchallenge_metrics
)
