"""Within-distance (radius) join: every (point, feature) pair closer than
``radius_km`` great-circle km.

The reference has no distance-join operator (its geo layer stops at
column classification, `cartwright/categories/geos.py`); this is part of
the engine's spatial-join family (north_rule: "point-in-polygon, kNN,
raster<->vector" — radius join is the fourth classic member, SURVEY.md
§2.5).

Physical plan (broadcast, the small-feature-side case — same shape as
``knn_join``):

- the feature table is ``ray.put`` ONCE; each actor builds unit
  3-vectors in ``__init__`` (once per actor, not per batch);
- per batch, a chunked matmul against the feature matrix gives cosine of
  the central angle; the radius becomes a dot-product threshold
  (``cos(r/R)``), so candidate selection is a single vectorized
  comparison — no per-row loop, no KD-tree rebuilds;
- candidates only are re-measured with exact haversine and filtered at
  the precise radius. The slack between the dot threshold and the exact
  test absorbs float error, so the predicate is exactly
  ``haversine_km(p, f) <= radius_km``.

For a LARGE feature side the broadcast plan stops fitting; the scale
path is the cell-keyed shuffle of ``pip_join_shuffle``: cover each
feature's radius disc with hex cells of comparable size, key points by
their cell, and ``groupby`` — documented trade-off, same partitioning
assumption (points and discs co-located by cell).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.haversine import EARTH_RADIUS_KM, haversine_km
from ..util import _pool


def _unit_xyz(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon)
    c = np.cos(phi)
    return np.stack([c * np.cos(lam), c * np.sin(lam), np.sin(phi)], axis=1)


class _RadiusActor:
    """Stateful stage: feature xyz matrix built once per actor."""

    def __init__(self, features_ref, radius_km: float):
        import ray
        feats = ray.get(features_ref) if not isinstance(features_ref, dict) \
            else features_ref
        ids = np.asarray(feats["feat_id"], dtype=object)
        flat = np.asarray(feats["lat"], dtype=np.float64)
        flon = np.asarray(feats["lon"], dtype=np.float64)
        order = np.argsort(ids, kind="stable")     # id-ordered output ties
        self.feat_ids = ids[order]
        self.flat = flat[order]
        self.flon = flon[order]
        self.xyz = _unit_xyz(self.flat, self.flon)
        self.radius_km = float(radius_km)
        # dot >= cos(angle) <=> distance <= radius; 1e-9 slack so float
        # error in the matmul can only ADD candidates (exact test prunes)
        self.dot_thresh = np.cos(self.radius_km / EARTH_RADIUS_KM) - 1e-9

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch["lat"], dtype=np.float64)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        q = _unit_xyz(lat, lon)
        n = len(lat)
        pt_idx_parts, ft_idx_parts = [], []
        for lo in range(0, n, 4096):               # bound matmul memory
            hi = min(lo + 4096, n)
            dots = q[lo:hi] @ self.xyz.T           # (chunk, m)
            pi, fi = np.nonzero(dots >= self.dot_thresh)
            pt_idx_parts.append(pi + lo)
            ft_idx_parts.append(fi)
        pt_idx = np.concatenate(pt_idx_parts) if pt_idx_parts \
            else np.empty(0, np.int64)
        ft_idx = np.concatenate(ft_idx_parts) if ft_idx_parts \
            else np.empty(0, np.int64)
        if len(pt_idx):
            d = haversine_km(lat[pt_idx], lon[pt_idx],
                             self.flat[ft_idx], self.flon[ft_idx])
            keep = d <= self.radius_km
            pt_idx, ft_idx, d = pt_idx[keep], ft_idx[keep], d[keep]
        else:
            d = np.empty(0, np.float64)
        out = batch.take(pa.array(pt_idx, pa.int64()))
        out = out.append_column(
            "feat_id", pa.array(self.feat_ids[ft_idx], pa.string()))
        out = out.append_column("dist_km", pa.array(d, pa.float64()))
        return out


def radius_join(points_ds, features: dict, radius_km: float,
                concurrency: int | None = None, batch_size: int = 8192):
    """points Dataset (lat/lon) x broadcast features {feat_id, lat, lon}
    -> one row per pair with haversine distance <= ``radius_km``
    (columns: input columns + feat_id + dist_km)."""
    import ray
    features_ref = ray.put(features)
    return points_ds.map_batches(
        _RadiusActor, fn_constructor_args=(features_ref, radius_km),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(concurrency), zero_copy_batch=True)


def brute_force_radius(lat, lon, features: dict, radius_km: float):
    """Oracle: exhaustive haversine; sorted (point_idx, feat_id) pairs."""
    flat = np.asarray(features["lat"], dtype=np.float64)
    flon = np.asarray(features["lon"], dtype=np.float64)
    fids = list(features["feat_id"])
    out = []
    for i, (la, lo) in enumerate(zip(lat, lon)):
        d = haversine_km(np.full(len(flat), la), np.full(len(flat), lo),
                         flat, flon)
        for j in np.nonzero(d <= radius_km)[0]:
            out.append((i, fids[j], float(d[j])))
    return sorted(out, key=lambda t: (t[0], t[1]))
