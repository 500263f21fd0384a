"""kNN nearest-feature join (north_rule "KD-tree kNN join for
nearest-feature enrichment"; no reference analogue — SURVEY.md §2.5).

Small-side feature table is broadcast (``ray.put``); each actor converts
feature lat/lon to unit 3-vectors once in ``__init__``. Per batch, the k
nearest features are found with a chunked matmul: on the unit sphere the
dot product is monotone in great-circle distance, so top-k by dot ==
k-nearest. This is fully vectorized (BLAS) — the honest baseline. A
KD-tree/grid-bucket variant only wins when the feature side is large; at
that point the right plan is a cell-keyed shuffle join (same pattern as
``pip_join_shuffle``).

Verified against :func:`brute_force_knn`.
"""

from __future__ import annotations

from ..util import _pool

import numpy as np
import pyarrow as pa

from ..geo.haversine import haversine_km


def _unit_xyz(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon)
    c = np.cos(phi)
    return np.stack([c * np.cos(lam), c * np.sin(lam), np.sin(phi)], axis=1)


class _KNNActor:
    """Ranking contract: neighbors are ordered by haversine distance
    ROUNDED to 6 decimals (1 mm) with feat_id tiebreak — the same order
    the DuckDB oracle's ``ORDER BY round(dist, 6), feat_id`` produces.
    Candidates come from the dot-product top-(k+margin) (dot is monotone
    in distance on the unit sphere; the margin absorbs float near-ties and
    duplicate feature positions), then the candidate set is re-ranked by
    rounded distance with a stable sort over id-ordered candidates."""

    _MARGIN = 16

    def __init__(self, features_ref, k: int):
        import ray
        feats = ray.get(features_ref) if not isinstance(features_ref, dict) \
            else features_ref
        ids = np.asarray(feats["feat_id"], dtype=object)
        flat = np.asarray(feats["lat"], dtype=np.float64)
        flon = np.asarray(feats["lon"], dtype=np.float64)
        order = np.argsort(ids, kind="stable")   # id-ordered → stable ties
        self.feat_ids = ids[order]
        self.flat = flat[order]
        self.flon = flon[order]
        self.xyz = _unit_xyz(self.flat, self.flon)   # (m, 3), built once
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch["lat"], dtype=np.float64)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        q = _unit_xyz(lat, lon)                      # (n, 3)
        n, m = len(lat), len(self.flat)
        k = min(self.k, m)
        cand_n = min(m, k + self._MARGIN)
        idx = np.empty((n, k), dtype=np.int64)
        for lo in range(0, n, 4096):                 # bound matmul memory
            hi = min(lo + 4096, n)
            dots = q[lo:hi] @ self.xyz.T             # (chunk, m)
            part = np.argpartition(-dots, cand_n - 1, axis=1)[:, :cand_n]
            part = np.sort(part, axis=1)             # feat-id order
            cd = haversine_km(
                np.repeat(lat[lo:hi], cand_n).reshape(-1, cand_n),
                np.repeat(lon[lo:hi], cand_n).reshape(-1, cand_n),
                self.flat[part], self.flon[part])
            order = np.argsort(np.round(cd, 6), axis=1, kind="stable")[:, :k]
            idx[lo:hi] = np.take_along_axis(part, order, axis=1)
        # explode to k rows per point
        point_rep = np.repeat(np.arange(n), k)
        flat_idx = idx.ravel()
        out = batch.take(pa.array(point_rep))
        out = out.append_column("neighbor_rank",
                                pa.array(np.tile(np.arange(k), n), pa.int32()))
        out = out.append_column("feat_id",
                                pa.array(self.feat_ids[flat_idx], pa.string()))
        dist = haversine_km(np.repeat(lat, k), np.repeat(lon, k),
                            self.flat[flat_idx], self.flon[flat_idx])
        out = out.append_column("feat_dist_km", pa.array(dist, pa.float64()))
        return out


def knn_join(points_ds, features: dict, k: int = 3,
             concurrency: int | None = None, batch_size: int = 8192):
    """points Dataset (lat/lon) × broadcast features {feat_id, lat, lon}
    → k rows per point with feat_id / neighbor_rank / feat_dist_km."""
    import ray
    features_ref = ray.put(features)
    return points_ds.map_batches(
        _KNNActor, fn_constructor_args=(features_ref, k),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(concurrency), zero_copy_batch=True)


def brute_force_knn(lat, lon, features: dict, k: int = 3):
    """Oracle: exhaustive haversine, list of (point_idx, rank, feat_id)."""
    flat = np.asarray(features["lat"], dtype=np.float64)
    flon = np.asarray(features["lon"], dtype=np.float64)
    fids = list(features["feat_id"])
    out = []
    for i, (la, lo) in enumerate(zip(lat, lon)):
        d = haversine_km(np.full(len(flat), la), np.full(len(flat), lo),
                         flat, flon)
        order = sorted(range(len(fids)),
                       key=lambda j: (round(float(d[j]), 6), fids[j]))
        for rank, j in enumerate(order[:k]):
            out.append((i, rank, fids[j]))
    return out
