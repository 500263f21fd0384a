"""Hilbert space-filling curve — xy ↔ distance at a fixed order, the
locality-preserving linearization used for spatial partitioning keys
(better cell adjacency than Z-order/geohash: consecutive d values are
always 4-neighbors).

Algorithm: the standard iterative rotate-and-accumulate form (public
domain, Wikipedia "Hilbert curve — Applications and mapping
algorithms"), vectorized: the loop runs over the ``order`` bit LEVELS
(16 iterations for a 2¹⁶×2¹⁶ grid), each level one numpy pass — never
over points. All arithmetic is int64 bit ops, so the DuckDB replay
(the same 16 levels unrolled as chained CTEs) is bit-exact.

Grid mapping: ``gx = clamp(floor((lon + 180) · 2^order / 360))``,
``gy = clamp(floor((lat + 90) · 2^order / 180))`` — one shared float
expression, identical in both engines.
"""

from __future__ import annotations

import numpy as np

ORDER = 16
N = 1 << ORDER


def hilbert_xy2d(gx: np.ndarray, gy: np.ndarray,
                 order: int = ORDER) -> np.ndarray:
    """Vectorized xy→d for int64 grid coords in [0, 2^order)."""
    x = gx.astype(np.int64).copy()
    y = gy.astype(np.int64).copy()
    d = np.zeros(len(x), np.int64)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: ry==0 -> (maybe flip) then swap x/y
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y_f, x_f), np.where(swap, x_f, y_f))
        s >>= 1
    return d


def hilbert_d2xy(d: np.ndarray, order: int = ORDER):
    """Vectorized d→xy (inverse; used by the round-trip property
    tests)."""
    x = np.zeros(len(d), np.int64)
    y = np.zeros(len(d), np.int64)
    t = d.astype(np.int64).copy()
    s = np.int64(1)
    n = np.int64(1 << order)
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y_f, x_f), np.where(swap, x_f, y_f))
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def grid_coords(lat: np.ndarray, lon: np.ndarray, order: int = ORDER):
    """Degrees → integer grid, the shared float expression (see module
    docstring)."""
    n = float(1 << order)
    gx = np.floor((lon + 180.0) * n / 360.0).astype(np.int64)
    gy = np.floor((lat + 90.0) * n / 180.0).astype(np.int64)
    np.clip(gx, 0, (1 << order) - 1, out=gx)
    np.clip(gy, 0, (1 << order) - 1, out=gy)
    return gx, gy
