"""Shared grid/padding helpers for the block-layout Pallas kernels.

Used by ops/pallas_block.py (fused round) and ops/pallas_loss.py (fused
losses): both process [BT, ...] block-major arrays G blocks per grid step
with leading-dim padding.  One copy so a BlockSpec/padding convention fix
(e.g. a Mosaic alignment rule) cannot silently desync the two.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def block_specs(shapes, g):
    """BlockSpecs slicing dim 0 in chunks of g blocks; full other dims."""
    return [
        pl.BlockSpec((g,) + s[1:],
                     lambda i, nd=len(s): (i,) + (0,) * (nd - 1),
                     memory_space=pltpu.VMEM)
        for s in shapes
    ]


def const_spec(shape):
    """Whole-array block with a constant index map (fetched once)."""
    return pl.BlockSpec(shape, lambda i, nd=len(shape): (0,) * nd,
                        memory_space=pltpu.VMEM)


def pad_leading(x, n):
    """Zero-pad dim 0 of x up to n rows."""
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)
