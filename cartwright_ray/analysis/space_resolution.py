"""Spatial grid-resolution detection — reference entry point 3
(`/root/reference/cartwright/analysis/space_resolution.py:29-107`).

The reference Delaunay-triangulates the deduped point cloud (scipy) and
keeps the axis-parallel triangle edges. scipy is unavailable here, so we use
the **equivalent axis-delta algorithm** (SURVEY.md §7.1): group points by
exact latitude → adjacent longitude diffs are the horizontal edges; group by
exact longitude → adjacent latitude diffs are the vertical edges. On a
regular grid this yields exactly the axis-parallel subset of Delaunay edges
(sans interior double-counting, which does not change medians on a grid);
on scattered points it yields ~none, so the no-grid gate still rejects.
Conformance-tested against the reference's golden grid expectations
(`tests/test_geospatial_resolution_detection.py:12-19`).

Downstream math (uniformity, unit matching, square vs rect branch, error
formulas) mirrors `space_resolution.py:68-107` exactly, in radians.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..detectors.schemas import AngleUnit, GeoSpatialResolution, Resolution
from .helpers import get_uniformity, match_unit


def preprocess_latlon(lat: np.ndarray, lon: np.ndarray,
                      rad: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Dedup point pairs, drop NaN rows, optional deg→rad
    (`space_resolution.py:9-26`)."""
    latlon = np.stack([np.asarray(lat, float), np.asarray(lon, float)], axis=0)
    latlon = np.unique(latlon, axis=1)
    latlon = latlon[:, ~np.isnan(latlon).any(axis=0)]
    if rad:
        latlon = np.deg2rad(latlon)
    return latlon[0], latlon[1]


def _axis_edges(key: np.ndarray, other: np.ndarray,
                tol: float = 1e-6) -> np.ndarray:
    """Adjacent diffs of ``other`` within groups of ``key`` equal to within
    ``tol`` (vectorized: lexsort then mask near-same-key adjacents).

    ``tol`` mirrors the reference's axis-parallel edge tolerance — a
    Delaunay edge counts as horizontal/vertical when the cross-axis delta
    is < 1e-6 RADIANS (`space_resolution.py:69-71`), so a grid whose rows
    are jittered by less than that is still detected by both engines.
    Chained tolerance grouping cannot merge distinct grid lines unless the
    grid spacing itself is < tol, where the reference's gate also breaks
    down (every edge counts as both horizontal and vertical).

    Implementation: cluster the sorted keys (new cluster where the
    adjacent key gap is ≥ tol), then sort by (cluster, other) so the
    within-cluster diffs of ``other`` are true neighbor deltas even when
    the keys inside a cluster differ by sub-tol jitter."""
    ks = np.sort(key)
    boundaries = np.empty(key.size, dtype=bool)
    boundaries[0] = True
    boundaries[1:] = (ks[1:] - ks[:-1]) >= tol
    starts = ks[boundaries]                       # cluster representatives
    cluster = np.searchsorted(starts, key, side="right") - 1
    order = np.lexsort((other, cluster))
    c, o = cluster[order], other[order]
    same = c[1:] == c[:-1]
    return (o[1:] - o[:-1])[same]


def detect_latlon_resolution(lat: np.ndarray,
                             lon: np.ndarray) -> Optional[GeoSpatialResolution]:
    """Detect a uniform lat/lon grid; returns square= or lat=/lon=
    resolutions (semantics of `space_resolution.py:29-107`)."""
    lat, lon = preprocess_latlon(lat, lon, rad=True)
    if lat.size <= 2:
        return None

    dlon = np.abs(_axis_edges(lat, lon))   # horizontal edges
    dlat = np.abs(_axis_edges(lon, lat))   # vertical edges

    # no-grid gate: a full m×n grid yields ≈2N axis edges; scattered points
    # yield ≈0 (floats rarely collide exactly). The reference's equivalent
    # gate is (H+V) < ⅓ of Delaunay edges (`space_resolution.py:73-74`).
    if dlon.size + dlat.size < lat.size:
        return None
    if dlon.size == 0 or dlat.size == 0:
        return None

    dlon_avg = np.median(dlon)
    dlat_avg = np.median(dlat)

    if np.abs(dlon_avg - dlat_avg) < 1e-6:
        # square grid branch (space_resolution.py:84-92)
        deltas = np.concatenate([dlon, dlat])
        avg = np.median(deltas)
        uniformity = get_uniformity(deltas, avg)
        scale, unit = match_unit(AngleUnit, np.rad2deg(avg))
        error = float(np.rad2deg(np.abs(deltas - avg).mean()) / unit.value)
        return GeoSpatialResolution(
            square=Resolution(uniformity, unit, float(scale), error))

    # rectangular branch (space_resolution.py:96-107)
    dlon_uni = get_uniformity(dlon, dlon_avg)
    dlon_scale, dlon_unit = match_unit(AngleUnit, np.rad2deg(dlon_avg))
    dlon_err = float(np.rad2deg(np.abs(1 - dlon / dlon_avg).mean()) / dlon_unit.value)

    dlat_uni = get_uniformity(dlat, dlat_avg)
    dlat_scale, dlat_unit = match_unit(AngleUnit, np.rad2deg(dlat_avg))
    dlat_err = float(np.rad2deg(np.abs(1 - dlat / dlat_avg).mean()) / dlat_unit.value)

    return GeoSpatialResolution(
        lat=Resolution(dlat_uni, dlat_unit, float(dlat_scale), dlat_err),
        lon=Resolution(dlon_uni, dlon_unit, float(dlon_scale), dlon_err),
    )


def detect_latlon_resolution_ds(ds, lat_col: str,
                                lon_col: str) -> Optional[GeoSpatialResolution]:
    """Distributed wrapper: exact dedup of (lat, lon) pairs via a Ray
    ``groupby`` shuffle, then the small kernel driver-side. The deduped set
    is grid-sized for detectable inputs (SURVEY.md §2.6 A5)."""
    import pyarrow as pa

    ds = ds.select_columns([lat_col, lon_col])

    def dedup_block(t: pa.Table) -> pa.Table:
        return t.group_by([lat_col, lon_col]).aggregate([])

    # per-block dedup (combiner) shrinks the shuffle input; the global
    # dedup is a groupby-count whose result streams back in batches.
    ds = ds.map_batches(dedup_block, batch_format="pyarrow")
    gb = ds.groupby([lat_col, lon_col]).count()
    lats, lons = [], []
    for b in gb.iter_batches(batch_size=65536, batch_format="pyarrow"):
        lats.append(np.asarray(b[lat_col], dtype=float))
        lons.append(np.asarray(b[lon_col], dtype=float))
    if not lats:
        return None
    return detect_latlon_resolution(np.concatenate(lats), np.concatenate(lons))
