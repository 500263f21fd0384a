"""Hierarchical aperture-7 hexagonal cell index ("H3-style").

FIDELITY STATEMENT (SURVEY.md §7.1): Uber H3's exact cell ids require the
icosahedral gnomonic projection with its 122-base-cell table and pentagon
distortion; the H3 library is unavailable in this environment and bit
compatibility could not be verified, so this module implements the same
*grid structure* — aperture-7 hexagons, each resolution √7 finer and
rotated by atan(√3/5) ≈ 19.1066° (the published Class-III rotation) — on
the web-mercator plane instead of the icosahedron. Column names follow the
north-star (``h3_r5``..``h3_r9``); the cell scheme is spec-derived, not
H3-bit-compatible. Hierarchy containment and aperture-7 growth are
property-tested.

Cell id layout (uint64): res (6 bits) << 48 | (q + 2^23) << 24 | (r + 2^23),
axial hex coordinates q/r. Valid for res 0..12.
"""

from __future__ import annotations

import numpy as np

from .mercator import MAX_LAT

# Class-III inter-resolution rotation angle for aperture-7 grids.
ALPHA = np.arctan(np.sqrt(3.0) / 5.0)
# circumradius of a res-0 hexagon in mercator-unit-square units
R0 = 0.18
SQRT7 = np.sqrt(7.0)
_OFF = np.int64(1 << 23)


def _mercator_xy(lat: np.ndarray, lon: np.ndarray):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = (lon + 180.0) / 360.0
    y = (1.0 - np.arcsinh(np.tan(np.deg2rad(lat))) / np.pi) / 2.0
    return x, y


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-coordinate rounding (standard hex-grid algorithm)."""
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq, dr, ds = np.abs(q - qf), np.abs(r - rf), np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _res_frame(res: int):
    """(circumradius, cosθ, sinθ) of the grid frame at ``res``."""
    radius = R0 / SQRT7 ** res
    theta = ALPHA * res
    return radius, np.cos(theta), np.sin(theta)


def hex_cell(lat: np.ndarray, lon: np.ndarray, res: int,
             xy: tuple | None = None) -> np.ndarray:
    """Cell id (uint64) of the hexagon containing each point at ``res``.

    ``xy``: pre-projected mercator coordinates, so multi-resolution
    encoders project once (see stages.encode)."""
    assert 0 <= res <= 12
    x, y = _mercator_xy(lat, lon) if xy is None else xy
    radius, c, s = _res_frame(res)
    xr = c * x + s * y
    yr = -s * x + c * y
    # pointy-top axial coordinates
    qf = (np.sqrt(3.0) / 3.0 * xr - yr / 3.0) / radius
    rf = (2.0 / 3.0 * yr) / radius
    q, r = _axial_round(qf, rf)
    return (np.uint64(res) << np.uint64(48)) \
        | ((q + _OFF).astype(np.uint64) << np.uint64(24)) \
        | (r + _OFF).astype(np.uint64)


def hex_cell_center(cell: np.ndarray):
    """(lat, lon) of each cell's center."""
    cell = np.asarray(cell, dtype=np.uint64)
    res_arr = (cell >> np.uint64(48)).astype(np.int64)
    q = ((cell >> np.uint64(24)) & np.uint64((1 << 24) - 1)).astype(np.int64) - _OFF
    r = (cell & np.uint64((1 << 24) - 1)).astype(np.int64) - _OFF
    lat = np.empty(cell.shape, dtype=np.float64)
    lon = np.empty(cell.shape, dtype=np.float64)
    for res in np.unique(res_arr):
        m = res_arr == res
        radius, c, s = _res_frame(int(res))
        xr = radius * np.sqrt(3.0) * (q[m] + r[m] / 2.0)
        yr = radius * 1.5 * r[m]
        x = c * xr - s * yr
        y = s * xr + c * yr
        lon[m] = x * 360.0 - 180.0
        lat[m] = np.rad2deg(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y))))
    return lat, lon


def hex_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Ancestor cell at a coarser resolution: the hexagon at ``parent_res``
    containing this cell's center (the aperture-7 parent relation)."""
    lat, lon = hex_cell_center(cell)
    return hex_cell(lat, lon, parent_res)


def hex_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(48)).astype(np.int64)
