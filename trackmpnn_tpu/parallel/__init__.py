from trackmpnn_tpu.parallel.mesh import make_mesh
from trackmpnn_tpu.parallel.block_parallel import make_sharded_block_step
from trackmpnn_tpu.parallel.data_parallel import (
    batch_schedules,
    batched_window_forward,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "batch_schedules",
    "batched_window_forward",
    "make_sharded_block_step",
    "make_sharded_train_step",
]
