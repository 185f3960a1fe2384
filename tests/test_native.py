"""Tests for the native C++ runtime support (fastio)."""

import numpy as np

from isca_tpu.native import combine_tiles, native_available, ns_clock, rss_kb
from isca_tpu.utils.clocks import Clocks


class TestNative:
    def test_native_builds(self):
        assert native_available(), "g++ build of fastio.cpp failed"

    def test_combine_tiles(self):
        full = np.random.rand(64, 8, 16).astype(np.float32)
        tiles = [full[0:16], full[16:40], full[40:64]]
        out = combine_tiles(tiles, [0, 16, 40], 64)
        np.testing.assert_array_equal(out, full)

    def test_combine_bounds_check(self):
        import pytest
        with pytest.raises(ValueError):
            combine_tiles([np.zeros((8, 4), np.float32)], [60], 64)

    def test_clock_monotonic(self):
        a = ns_clock()
        b = ns_clock()
        assert b >= a

    def test_rss(self):
        assert rss_kb() > 1000  # at least 1 MB resident

    def test_clocks_summary(self):
        c = Clocks()
        with c.clock("outer"):
            with c.clock("inner"):
                sum(range(1000))
        s = c.summary()
        assert "outer" in s and "inner" in s and "rss" in s
