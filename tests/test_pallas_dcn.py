"""Interpret-mode parity for the fused Pallas DCN sampling kernel
(ops/pallas_dcn.py) against the XLA shifted-warp and gather references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackmpnn_tpu.backbones import deform_conv as DC
from trackmpnn_tpu.ops.pallas_dcn import deform_conv2d_shift_pallas


@pytest.mark.parametrize("shape", [(10, 16, 8, 8), (13, 21, 4, 6), (9, 33, 16, 4)])
def test_pallas_matches_shift(rng, shape):
    H, W, Cin, Cout = shape
    x = jnp.asarray(rng.normal(size=(H, W, Cin)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(9 * Cin, Cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-3.9, 3.9, size=(H, W, 18)).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0, 1, size=(H, W, 9)).astype(np.float32))
    ref = DC.deform_conv2d_shift(x[None], wgt, b, off[None], msk[None],
                                 max_offset=4.0)[0]
    got = deform_conv2d_shift_pallas(x, wgt, b, off, msk, max_offset=4.0,
                                     tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_matches_exact_gather_in_bound(rng):
    """With offsets inside the bound the whole stack equals the exact
    arbitrary-offset gather decomposition (deform_conv2d)."""
    H, W, Cin, Cout = 11, 14, 8, 5
    x = jnp.asarray(rng.normal(size=(H, W, Cin)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(9 * Cin, Cout)).astype(np.float32))
    b = jnp.zeros((Cout,), jnp.float32)
    off = jnp.asarray(rng.uniform(-1.9, 1.9, size=(H, W, 18)).astype(np.float32))
    msk = jnp.asarray(rng.uniform(0, 1, size=(H, W, 9)).astype(np.float32))
    exact = DC.deform_conv2d(x[None], wgt, b, off[None], msk[None])[0]
    got = deform_conv2d_shift_pallas(x, wgt, b, off, msk, max_offset=2.0,
                                     tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact),
                               rtol=1e-4, atol=1e-5)


def test_pallas_channel_padding_path(rng):
    """Cin not a multiple of 128 exercises the zero-padded channel lanes."""
    H, W, Cin, Cout = 8, 12, 3, 4
    x = jnp.asarray(rng.normal(size=(H, W, Cin)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(9 * Cin, Cout)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-1.5, 1.5, size=(H, W, 18)).astype(np.float32))
    msk = jnp.ones((H, W, 9), jnp.float32)
    ref = DC.deform_conv2d_shift(x[None], wgt, None, off[None], msk[None],
                                 max_offset=2.0)[0]
    got = deform_conv2d_shift_pallas(x, wgt, None, off, msk, max_offset=2.0,
                                     tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
