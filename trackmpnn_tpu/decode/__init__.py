from trackmpnn_tpu.decode.tracker import Tracker, TrackerConfig

__all__ = ["Tracker", "TrackerConfig"]
