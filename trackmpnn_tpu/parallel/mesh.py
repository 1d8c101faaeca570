"""Device-mesh helpers.

All parallelism in this framework is net-new capability (the reference has
none: batch size is hard-asserted to 1 and there is no distributed code
anywhere, SURVEY.md 2).  The scaling axes:

  * 'data'  - independent rolling windows (chunks) per device group;
  * 'edge'  - the slot (graph-row) axis of each window: row-wise GRU/MLP
    work and edge messages partition across devices, with XLA inserting the
    boundary collectives (segment-sum psum, hidden-state all-gather) from
    sharding annotations.

Multi-host initialization goes through jax.distributed.initialize upstream
of these helpers; they only see the global device list.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: dict, devices: Optional[Sequence] = None) -> Mesh:
    """axes: ordered {name: size}; total must equal len(devices).

    Example: make_mesh({'data': 4, 'edge': 2}) on 8 devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axes.keys()))
