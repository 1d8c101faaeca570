"""PrefetchLoader ordering and error propagation."""

import time

import pytest

from trackmpnn_tpu.data.loader import PrefetchLoader


def test_preserves_order():
    def build(i):
        time.sleep(0.01 * (5 - i % 5))  # out-of-order completion
        return i * 10

    order = list(range(12))
    out = list(PrefetchLoader(build, order, depth=4, workers=3))
    assert out == [i * 10 for i in order]


def test_propagates_exceptions():
    def build(i):
        if i == 3:
            raise RuntimeError("boom")
        return i

    with pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(build, range(6), depth=2, workers=2))


def test_empty():
    assert list(PrefetchLoader(lambda i: i, [], depth=2)) == []
