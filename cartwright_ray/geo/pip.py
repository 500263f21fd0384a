"""Vectorized point-in-polygon (ray casting, even-odd rule).

O(points × edges) numpy per polygon — used inside per-cell groups after the
groupby-on-cell shuffle, where each group only tests the handful of
polygons whose cell cover intersects the group's cell
(``cartwright_ray.joins.pip_join``).
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(lat: np.ndarray, lon: np.ndarray,
                      ring_lat: np.ndarray, ring_lon: np.ndarray) -> np.ndarray:
    """Boolean mask: point i inside the (closed or open) ring.

    Standard even-odd crossing test in lon/lat plane. Points exactly on an
    edge may land on either side (consistent with typical float PIP).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    ry = np.asarray(ring_lat, dtype=np.float64)
    rx = np.asarray(ring_lon, dtype=np.float64)
    if ry.size >= 2 and ry[0] == ry[-1] and rx[0] == rx[-1]:
        ry, rx = ry[:-1], rx[:-1]
    n = ry.size
    inside = np.zeros(lat.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        yi, xi = ry[i], rx[i]
        yj, xj = ry[j], rx[j]
        cond = ((yi > lat) != (yj > lat))
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        inside ^= cond & (lon < xcross)
        j = i
    return inside


def polygon_bbox(ring_lat, ring_lon):
    ry = np.asarray(ring_lat, dtype=np.float64)
    rx = np.asarray(ring_lon, dtype=np.float64)
    return float(ry.min()), float(ry.max()), float(rx.min()), float(rx.max())
