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
import pyarrow.compute as pc

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


# worker-process-global state cache for the task plan (same pattern as
# pip_join._pip_task): the feature matrix is still built once per worker,
# but tasks reuse Ray's warm worker pool instead of paying actor-pool
# startup/ramp per dataset — on small/medium inputs the pool ramp WAS the
# wall time
_TASK_STATE_CACHE: dict = {}


def _radius_task(batch: pa.Table, features_ref, radius_km: float) -> pa.Table:
    key = (getattr(features_ref, "hex", lambda: id(features_ref))(),
           radius_km)
    st = _TASK_STATE_CACHE.get(key)
    if st is None:
        if len(_TASK_STATE_CACHE) > 16:      # bound worker memory
            _TASK_STATE_CACHE.clear()
        st = _TASK_STATE_CACHE.setdefault(
            key, _RadiusActor(features_ref, radius_km))
    return st(batch)


def radius_join(points_ds, features: dict, radius_km: float,
                concurrency: int | None = None,
                batch_size: int | None = None, plan: str = "tasks"):
    """points Dataset (lat/lon) x broadcast features {feat_id, lat, lon}
    -> one row per pair with haversine distance <= ``radius_km``
    (columns: input columns + feat_id + dist_km).

    ``plan="tasks"`` (default): stateless tasks + per-worker feature-matrix
    cache — fuses with upstream maps, full width immediately.
    ``plan="actors"``: explicit actor pool for very heavy feature sides.
    """
    import functools

    import ray
    features_ref = ray.put(features)
    if plan == "tasks":
        return points_ds.map_batches(
            functools.partial(_radius_task, features_ref=features_ref,
                              radius_km=radius_km),
            batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True)
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


# ---------------------------------------------------------------------------
# shuffle plan (large feature side)
# ---------------------------------------------------------------------------

def _grid_cell_ids(lat: np.ndarray, lon: np.ndarray, row_deg: float,
                   col_deg: float):
    """(row, col) integer grid cell of each point on a lat/lon graticule.

    Row and column sizes differ: columns must divide 360 EVENLY (the
    caller rounds the column width UP to 360/n_cols) — otherwise the
    last column before the antimeridian is narrower than the radius at
    high latitudes, and a pair straddling it can miss its 3x3
    co-location."""
    row = np.floor((lat + 90.0) / row_deg).astype(np.int64)
    col = np.floor(((lon + 180.0) % 360.0) / col_deg).astype(np.int64)
    return row, col


def radius_join_shuffle(points_ds, features_ds, radius_km: float,
                        point_schema=None):
    """Within-distance join for a LARGE feature side: both sides are keyed
    onto a lat/lon graticule whose cell edge is >= the radius, features
    are replicated into every cell their radius disc can touch (the 3x3
    neighborhood — guaranteed sufficient because cell edge >= radius in
    BOTH axes at the widest point of the disc), and ONE ``groupby`` on
    the cell key co-locates each point with every feature that can be
    within range. Per-group work is a vectorized brute force over the
    (bounded) group.

    Partitioning assumptions, explicit:

    - cell height is ``cell_deg`` latitude degrees with
      ``cell_deg >= radius/111.045 km``, so a disc spans <= 2 rows;
    - the longitude edge shrinks by cos(lat), so above ``POLAR_LAT`` the
      3x3 neighborhood stops covering the disc — those rows fall into a
      single polar bucket per hemisphere (tiny at real-data densities;
      the classic polar-cap special case);
    - hot cells: a dense city cell makes one big group — compose with
      ``pip_join.salted_keys``-style salting on the point side if a cell
      histogram shows skew (the feature side must then be replicated per
      salt, the standard trade).
    """
    import ray.data

    POLAR_LAT = 80.0
    # one latitude degree is ~111.045 km (spherical mean); the longitude
    # degree shrinks by cos(lat) — at POLAR_LAT cos = 0.17, so cell edge
    # in km stays >= radius as long as cell_deg * 111.045 * 0.17 >= radius
    cell_deg = max(radius_km / (111.045 * np.cos(np.deg2rad(POLAR_LAT))),
                   0.25)
    # columns divide 360 evenly and are rounded UP to >= cell_deg, so
    # EVERY column (including the one before the antimeridian) is at
    # least radius wide at all latitudes below POLAR_LAT
    n_cols = max(1, int(360.0 // cell_deg))
    col_deg = 360.0 / n_cols
    n_rows = int(np.ceil(180.0 / cell_deg)) + 1

    # the two sides are UNIONed ahead of the groupby, so both must carry
    # one schema: point columns + (rj_feat_id, rj_flat, rj_flon) +
    # (rj_key, rj_side), the feature fields null on point rows and vice
    # versa. Callers that know the Arrow schema pass ``point_schema``;
    # otherwise arrow_schema_of reads it from Dataset metadata (one-row
    # probe only for pandas-born lineages — VERDICT r02 minor #5)
    if point_schema is not None:
        p_schema = point_schema
    else:
        from ..stages.partition import arrow_schema_of
        p_schema = arrow_schema_of(points_ds)

    def _keys_of(lat, lon):
        return _grid_cell_ids(lat, lon, cell_deg, col_deg)

    def key_points(t: pa.Table) -> pa.Table:
        lat = np.asarray(t["lat"], dtype=np.float64)
        lon = np.asarray(t["lon"], dtype=np.float64)
        row, col = _keys_of(lat, lon)
        polar = np.abs(lat) >= POLAR_LAT
        key = np.where(polar, -1 - (lat > 0).astype(np.int64),
                       row * n_cols + col)
        n = len(lat)
        out = t.append_column("rj_feat_id", pa.nulls(n, pa.string()))
        out = out.append_column("rj_flat", pa.nulls(n, pa.float64()))
        out = out.append_column("rj_flon", pa.nulls(n, pa.float64()))
        out = out.append_column("rj_key", pa.array(key, pa.int64()))
        return out.append_column("rj_side", pa.array(np.zeros(n, np.int8)))

    def key_features(t: pa.Table) -> pa.Table:
        lat = np.asarray(t["lat"], dtype=np.float64)
        lon = np.asarray(t["lon"], dtype=np.float64)
        fid = t["feat_id"]
        row, col = _keys_of(lat, lon)
        keys, idxs = [], []
        for dr in (-1, 0, 1):
            r2 = row + dr
            ok = (r2 >= 0) & (r2 < n_rows)
            for dc in (-1, 0, 1):
                c2 = (col + dc) % n_cols          # antimeridian wrap
                keys.append((r2 * n_cols + c2)[ok])
                idxs.append(np.nonzero(ok)[0])
        # polar buckets: every feature whose disc can reach a polar row
        reach = 1.2 * radius_km / 111.045
        for sign, bucket in ((1, -2), (-1, -1)):
            m = sign * lat >= POLAR_LAT - reach
            keys.append(np.full(int(m.sum()), bucket, dtype=np.int64))
            idxs.append(np.nonzero(m)[0])
        key = np.concatenate(keys)
        idx = np.concatenate(idxs)
        n = len(idx)
        take = pa.array(idx, pa.int64())
        cols = []
        for fld in p_schema:
            cols.append(pa.nulls(n, fld.type))
        out = pa.Table.from_arrays(cols, schema=p_schema)
        out = out.append_column("rj_feat_id",
                                pc.cast(fid.take(take), pa.string()))
        out = out.append_column(
            "rj_flat", pa.array(lat[idx], pa.float64()))
        out = out.append_column(
            "rj_flon", pa.array(lon[idx], pa.float64()))
        out = out.append_column("rj_key", pa.array(key, pa.int64()))
        return out.append_column("rj_side", pa.array(np.ones(n, np.int8)))

    pts = points_ds.map_batches(key_points, batch_format="pyarrow")
    fts = features_ds.map_batches(key_features, batch_format="pyarrow")
    both = pts.union(fts)

    def per_cell(g: pa.Table) -> pa.Table:
        side = np.asarray(g["rj_side"])
        p = g.filter(pa.array(side == 0))
        f = g.filter(pa.array(side == 1))
        out_schema = p_schema \
            .append(pa.field("feat_id_matched", pa.string())) \
            .append(pa.field("dist_km", pa.float64()))
        if p.num_rows == 0 or f.num_rows == 0:
            return out_schema.empty_table()
        plat = np.asarray(p["lat"], dtype=np.float64)
        plon = np.asarray(p["lon"], dtype=np.float64)
        flat = np.asarray(f["rj_flat"], dtype=np.float64)
        flon = np.asarray(f["rj_flon"], dtype=np.float64)
        fid = np.asarray(f["rj_feat_id"], dtype=object)
        # a feature lands in one group once per replication direction; a
        # (point, feature) pair can still only meet in ONE group (the
        # point has exactly one key) — but the same feature may appear
        # twice in a POLAR bucket (regular + polar emit), so dedup ids
        uniq, first = np.unique(fid.astype(str), return_index=True)
        flat, flon, fid = flat[first], flon[first], fid[first]
        pi_parts, fi_parts, d_parts = [], [], []
        for lo in range(0, len(plat), 2048):      # bound the pair matrix
            hi = min(lo + 2048, len(plat))
            d = haversine_km(plat[lo:hi, None], plon[lo:hi, None],
                             flat[None, :], flon[None, :])
            pi, fi = np.nonzero(d <= radius_km)
            pi_parts.append(pi + lo)
            fi_parts.append(fi)
            d_parts.append(d[pi, fi])
        pi = np.concatenate(pi_parts)
        fi = np.concatenate(fi_parts)
        dd = np.concatenate(d_parts)
        out = p.select([f.name for f in p_schema]) \
               .take(pa.array(pi, pa.int64()))
        out = out.append_column("feat_id_matched",
                                pa.array(fid[fi], pa.string()))
        out = out.append_column("dist_km", pa.array(dd, pa.float64()))
        return out

    return both.groupby("rj_key").map_groups(per_cell,
                                             batch_format="pyarrow")
