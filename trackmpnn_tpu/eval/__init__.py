from trackmpnn_tpu.eval.mot import MOTAccumulator, summarize
from trackmpnn_tpu.eval.detection import compute_map

__all__ = ["MOTAccumulator", "summarize", "compute_map"]
