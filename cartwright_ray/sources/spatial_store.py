"""Geohash-partitioned spatial store: reader-level pruning for bbox
queries.

The third member of the engine's partition-pruned-read family (IVF-list
ANN corpus, ``stages/ann.py``; token-bucket inverted index,
``stages/tfidf.py``): points are written as parquet PARTITIONED by a
geohash prefix, so a bounding-box query opens ONLY the partition
directories whose cells intersect the box — at 100 TB the scan cost is
proportional to the query's area, not the corpus (everything else never
leaves storage). A residual exact filter inside ``map_batches`` removes
the cell-overhang rows, so results equal a full-scan filter exactly.

This generalizes cartwright's lat/lon awareness (reference columns:
``cartwright/categories/geos.py``) from classification to a storage
layout; the reference has no storage engine at all. Partition dirs also
give the resumable-write unit (one directory per cell — a failed write
job re-runs only missing cells).

Wrap-around boxes (lon0 > lon1 across the antimeridian) are split by
the caller into two boxes; ``bbox_cover_prefixes`` asserts the
non-wrapped contract.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geo.geohash import geohash_encode, geohash_encode_arrow
from ..geo.haversine import EARTH_RADIUS_KM, haversine_km


def _cell_steps(precision: int) -> tuple[float, float]:
    """(dlat, dlon) of one geohash cell at the given precision.

    Geohash interleaves bits starting with longitude, so of the
    ``5 * precision`` bits, longitude gets the ceiling half.
    """
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    return 180.0 / (1 << lat_bits), 360.0 / (1 << lon_bits)


def bbox_cover_prefixes(lat0: float, lat1: float, lon0: float, lon1: float,
                        precision: int = 3) -> list[str]:
    """Sorted distinct geohash prefixes of all cells intersecting the
    box (inclusive edges). Pure metadata math: enumerates the cell grid
    over the box and encodes the cell CENTERS, so the list size is
    O(box area / cell area), never O(data)."""
    if lon0 > lon1:
        raise ValueError("wrap-around box: split at the antimeridian")
    dlat, dlon = _cell_steps(precision)
    la0 = int(np.floor((np.clip(lat0, -90.0, 90.0) + 90.0) / dlat))
    la1 = int(np.floor((np.clip(lat1, -90.0, 90.0 - 1e-12) + 90.0) / dlat))
    lo0 = int(np.floor((np.clip(lon0, -180.0, 180.0) + 180.0) / dlon))
    lo1 = int(np.floor((np.clip(lon1, -180.0, 180.0 - 1e-12) + 180.0)
                       / dlon))
    las = (np.arange(la0, la1 + 1) + 0.5) * dlat - 90.0
    los = (np.arange(lo0, lo1 + 1) + 0.5) * dlon - 180.0
    glat, glon = np.meshgrid(las, los)
    cells = geohash_encode(glat.ravel(), glon.ravel(), precision)
    return sorted(set(cells.tolist()))


def _pid_of_cell(cell: str) -> str:
    """checkpointed_write_by_key's partition id for a geohash cell
    (sanitize is the identity on base-32 cells)."""
    import hashlib
    return cell + "-" + hashlib.blake2b(
        cell.encode("utf-8"), digest_size=4).hexdigest()


def write_spatial_partitioned(ds, path: str, precision: int = 3,
                              lat_col: str = "lat", lon_col: str = "lon",
                              resumable: bool = False):
    """Write points as parquet partitioned by their geohash prefix.

    One streaming pass: the partition key is appended per batch
    (vectorized encode straight to Arrow). ``resumable=False`` uses
    Ray's hive-style parquet sink (``gh=<cell>/`` directories);
    ``resumable=True`` routes through the engine's per-partition
    checkpoint manifest (``state/checkpoint.checkpointed_write_by_key``,
    one ``part-<cell>-<hash>.parquet`` per cell + lineage record) so a
    failed write job re-runs ONLY missing cells. Both layouts are read
    by :func:`read_bbox` / :func:`read_radius`; the checkpointed layout
    returns the writer's {written, skipped, rows} stats.
    """

    def add_cell(t: pa.Table) -> pa.Table:
        lat = np.asarray(t[lat_col], dtype=np.float64)
        lon = np.asarray(t[lon_col], dtype=np.float64)
        return t.append_column(
            "gh", geohash_encode_arrow(lat, lon, precision))

    keyed = ds.map_batches(add_cell, batch_format="pyarrow")
    if resumable:
        from ..state.checkpoint import checkpointed_write_by_key
        return checkpointed_write_by_key(keyed, path, part_col="gh")
    keyed.write_parquet(path, partition_cols=["gh"])
    return None


def _drop_layout_cols(t: pa.Table) -> pa.Table:
    """Strip store-internal columns (partition key; pandas index from
    the checkpointed layout) so both layouts read identically."""
    drop = [c for c in t.column_names
            if c == "gh" or c.startswith("__index_level_")]
    return t.drop_columns(drop) if drop else t


def _files_for_prefixes(path: str, prefixes) -> list[str]:
    """Data files for the given cell prefixes under EITHER store layout
    (hive ``gh=<cell>/`` dirs, or checkpointed ``part-<cell>-<hash>``
    files)."""
    files: list[str] = []
    for p in prefixes:
        d = os.path.join(path, f"gh={p}")
        if os.path.isdir(d):
            files += [os.path.join(d, f) for f in sorted(os.listdir(d))
                      if f.endswith(".parquet")]
        f = os.path.join(path, f"part-{_pid_of_cell(p)}.parquet")
        if os.path.isfile(f):
            files.append(f)
    return files


def _extend_columns(columns, lat_col: str, lon_col: str):
    """Extend a caller projection with whichever of lat/lon the residual
    filter needs, each checked INDEPENDENTLY (requesting lat but not lon
    raised KeyError before, ADVICE r03), and report the appended names so
    the residual can drop them — the caller gets exactly the projection
    it asked for."""
    if columns is None:
        return None, []
    columns = list(columns)
    extra = [c for c in (lat_col, lon_col) if c not in columns]
    return columns + extra, extra


def read_bbox(path: str, lat0: float, lat1: float, lon0: float, lon1: float,
              precision: int = 3, lat_col: str = "lat",
              lon_col: str = "lon", columns: list[str] | None = None):
    """Points inside the box, opening ONLY the matching cell partitions.

    Returns a streaming Dataset; the residual filter trims cell-overhang
    rows so the result equals a full-scan ``BETWEEN`` filter exactly.
    """
    import ray.data

    prefixes = bbox_cover_prefixes(lat0, lat1, lon0, lon1, precision)
    files = _files_for_prefixes(path, prefixes)
    columns, extra = _extend_columns(columns, lat_col, lon_col)
    if not files:
        return None
    ds = ray.data.read_parquet(files, columns=columns)

    def residual(t: pa.Table) -> pa.Table:
        t = _drop_layout_cols(t)
        lat = t[lat_col]
        lon = t[lon_col]
        m = pc.and_(
            pc.and_(pc.greater_equal(lat, pa.scalar(float(lat0))),
                    pc.less_equal(lat, pa.scalar(float(lat1)))),
            pc.and_(pc.greater_equal(lon, pa.scalar(float(lon0))),
                    pc.less_equal(lon, pa.scalar(float(lon1)))))
        t = t.filter(m)
        return t.drop_columns(extra) if extra else t

    return ds.map_batches(residual, batch_format="pyarrow")


def _cap_bbox(lat: float, lon: float, radius_km: float):
    """Bounding box(es) of a spherical cap: lat band ± r/R; lon
    half-width arcsin(sin(r/R)/cos(lat)) at the cap's widest latitude
    (the standard cap-bbox formula), full range when the cap reaches a
    pole. Returns (lat0, lat1, [(lon0, lon1), ...]) — two lon intervals
    when the cap crosses the antimeridian."""
    ang = radius_km / EARTH_RADIUS_KM
    dlat = np.degrees(ang)
    lat0, lat1 = lat - dlat, lat + dlat
    if lat0 <= -90.0 or lat1 >= 90.0 or ang >= np.pi / 2:
        return max(lat0, -90.0), min(lat1, 90.0), [(-180.0, 180.0)]
    s = np.sin(ang) / np.cos(np.radians(lat))
    if s >= 1.0:
        return lat0, lat1, [(-180.0, 180.0)]
    dlon = float(np.degrees(np.arcsin(s)))
    lo0, lo1 = lon - dlon, lon + dlon
    if lo0 < -180.0:
        return lat0, lat1, [(-180.0, lo1), (lo0 + 360.0, 180.0)]
    if lo1 > 180.0:
        return lat0, lat1, [(lo0, 180.0), (-180.0, lo1 - 360.0)]
    return lat0, lat1, [(lo0, lo1)]


def read_radius(path: str, lat: float, lon: float, radius_km: float,
                precision: int = 3, lat_col: str = "lat",
                lon_col: str = "lon", columns: list[str] | None = None):
    """Points within ``radius_km`` of (lat, lon) great-circle, opening
    ONLY the cell partitions intersecting the cap's bounding box(es)
    (antimeridian-crossing caps split into two boxes) with an exact
    haversine residual filter. None when no partition matches."""
    import ray.data

    lat0, lat1, lon_spans = _cap_bbox(lat, lon, radius_km)
    prefixes: set[str] = set()
    for lo0, lo1 in lon_spans:
        prefixes |= set(bbox_cover_prefixes(lat0, lat1, lo0, lo1, precision))
    files = _files_for_prefixes(path, sorted(prefixes))
    columns, extra = _extend_columns(columns, lat_col, lon_col)
    if not files:
        return None
    ds = ray.data.read_parquet(files, columns=columns)

    def residual(t: pa.Table) -> pa.Table:
        t = _drop_layout_cols(t)
        plat = np.asarray(t[lat_col], dtype=np.float64)
        plon = np.asarray(t[lon_col], dtype=np.float64)
        d = haversine_km(plat, plon, np.full_like(plat, lat),
                         np.full_like(plon, lon))
        t = t.filter(pa.array(d <= radius_km))
        return t.drop_columns(extra) if extra else t

    return ds.map_batches(residual, batch_format="pyarrow")
