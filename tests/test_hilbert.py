"""Hilbert curve — round-trip, adjacency and locality properties.

The defining properties of the curve pin the implementation without a
reference library: (1) d2xy(xy2d(p)) == p for random and corner
points, (2) consecutive d values map to 4-neighbor grid cells (the
property Z-order/geohash lack — the reason this encoding exists),
(3) the full order-4 curve visits every cell of the 16×16 grid exactly
once, (4) the known order-1 quadrant order (0,0)→(0,1)→(1,1)→(1,0).
"""

import numpy as np

from cartwright_ray.geo.hilbert import (grid_coords, hilbert_d2xy,
                                        hilbert_xy2d)


def test_round_trip_random_and_corners():
    rng = np.random.default_rng(61)
    gx = np.r_[rng.integers(0, 1 << 16, 5000),
               [0, 0, (1 << 16) - 1, (1 << 16) - 1]]
    gy = np.r_[rng.integers(0, 1 << 16, 5000),
               [0, (1 << 16) - 1, 0, (1 << 16) - 1]]
    d = hilbert_xy2d(gx, gy)
    assert d.min() >= 0 and d.max() < (1 << 32)
    x2, y2 = hilbert_d2xy(d)
    np.testing.assert_array_equal(x2, gx)
    np.testing.assert_array_equal(y2, gy)


def test_consecutive_d_are_grid_neighbors():
    d = np.arange(4096, dtype=np.int64)        # full order-6 sub-run
    x, y = hilbert_d2xy(d, order=6)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    np.testing.assert_array_equal(step, np.ones(len(d) - 1))


def test_order4_is_a_permutation():
    d = np.arange(256, dtype=np.int64)
    x, y = hilbert_d2xy(d, order=4)
    assert len({(a, b) for a, b in zip(x, y)}) == 256
    np.testing.assert_array_equal(
        np.sort(hilbert_xy2d(x, y, order=4)), d)


def test_order1_quadrant_order():
    x, y = hilbert_d2xy(np.arange(4, dtype=np.int64), order=1)
    assert list(zip(x, y)) == [(0, 0), (0, 1), (1, 1), (1, 0)]


def test_grid_coords_clip_and_floor():
    lat = np.array([-90.0, 90.0, 0.0, 89.9999])
    lon = np.array([-180.0, 180.0, 0.0, 179.9999])
    gx, gy = grid_coords(lat, lon)
    assert gx[0] == 0 and gy[0] == 0
    assert gx[1] == (1 << 16) - 1 and gy[1] == (1 << 16) - 1
    assert gx[2] == 1 << 15 and gy[2] == 1 << 15
