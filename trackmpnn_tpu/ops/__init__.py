from trackmpnn_tpu.ops.segment import (
    segment_sum,
    segment_max,
    segment_min,
    segment_argmax,
    segment_argmin,
    segment_logsumexp,
    segment_softmax,
)

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_min",
    "segment_argmax",
    "segment_argmin",
    "segment_logsumexp",
    "segment_softmax",
]
