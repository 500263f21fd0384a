"""Geofence transition detection — enter/exit events when an ordered
track crosses an admin-polygon boundary.

The canonical movement-analytics composite of the engine's two halves:
the broadcast point-in-polygon machinery (:mod:`..joins.pip_join`,
north_rule's admin-boundary join) assigns every ping a ZONE (the
lexicographically smallest containing ``admin_id``, or the ``"none"``
sentinel outside every polygon), and the trajectory exchange discipline
(:func:`..pipelines.relational.track_segments`) turns the zone sequence
into transition rows. No reference analogue — the reference's geo layer
stops at column classification (`cartwright/categories/geos.py`).

Scale shape:

- Zone assignment is a pure broadcast map (stateless tasks + the shared
  per-worker ``PolygonIndex`` cache — polygons ship once via ``ray.put``,
  the cover index is built once per worker, every batch probe is the
  existing vectorized crossing test). Nothing corpus-sized moves.
- Transitions need within-track order, so ONE sort exchange keyed on the
  track id ALONE (the exchange-discipline rule: a composite (user, ts)
  key can split one user across a range boundary), then a whole-block
  numpy kernel — per-user order, lag compare and emit are each one pass
  across ALL users in the block.

Bit-exactness: zones are strings decided by the same IEEE crossing
arithmetic the driver-green ``pip_join_counts`` oracle replays; the
transition predicate is string inequality on those zones — the DuckDB
oracle (PIP VALUES edge table + window ``lag``) is therefore
value-identical, not approximately so.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..joins.pip_join import DEFAULT_COVER_RES, PolygonIndex, \
    _TASK_INDEX_CACHE
from .partition import key_segments

NO_ZONE = "none"


def _zone_task(batch: pa.Table, polygons_ref, cover_res: int,
               lat_col: str, lon_col: str) -> pa.Table:
    """Append a ``zone`` column: min admin_id containing the point, else
    the ``"none"`` sentinel. Worker-global index cache, same key scheme
    as joins.pip_join._pip_task."""
    import ray
    key = (getattr(polygons_ref, "hex", lambda: id(polygons_ref))(),
           cover_res)
    index = _TASK_INDEX_CACHE.get(key)
    if index is None:
        if len(_TASK_INDEX_CACHE) > 8:
            _TASK_INDEX_CACHE.clear()
        polys = ray.get(polygons_ref) \
            if not isinstance(polygons_ref, list) else polygons_ref
        index = _TASK_INDEX_CACHE.setdefault(
            key, PolygonIndex(polys, cover_res))
    lat = np.asarray(batch[lat_col], dtype=np.float64)
    lon = np.asarray(batch[lon_col], dtype=np.float64)
    pidx, admin, _ = index.probe(lat, lon)
    zone = np.full(len(lat), NO_ZONE, dtype=object)
    if len(pidx):
        admin = np.asarray(admin, dtype=str)
        order = np.lexsort((admin, pidx))      # by point, then admin asc
        pidx, admin = pidx[order], admin[order]
        first = np.r_[True, pidx[1:] != pidx[:-1]]
        zone[pidx[first]] = admin[first]       # min admin_id per point
    return batch.append_column("zone", pa.array(zone, pa.string()))


def assign_zones(points_ds, polygons: list[dict],
                 cover_res: int = DEFAULT_COVER_RES,
                 lat_col: str = "lat", lon_col: str = "lon"):
    """Broadcast zone assignment: every input row kept, ``zone`` column
    appended (LEFT-join semantics, unlike pip_join's inner join)."""
    import functools

    import ray
    polygons_ref = ray.put(polygons)
    return points_ds.map_batches(
        functools.partial(_zone_task, polygons_ref=polygons_ref,
                          cover_res=cover_res, lat_col=lat_col,
                          lon_col=lon_col),
        batch_format="pyarrow", zero_copy_batch=True)


def geofence_transitions(points_ds, polygons: list[dict],
                         track_col: str = "user_id",
                         order_cols=("ts", "event_id"),
                         event_col: str = "event_id",
                         cover_res: int = DEFAULT_COVER_RES):
    """→ (track_col, event_col, from_zone, to_zone): one row per ping
    whose zone differs from the previous ping of the same track (in
    ``order_cols`` order). The first ping of a track never emits."""
    order_cols = list(order_cols)
    ds = assign_zones(points_ds, polygons, cover_res=cover_res)

    out_schema = pa.schema([pa.field(track_col, pa.int64()),
                            pa.field(event_col, pa.int64()),
                            pa.field("from_zone", pa.string()),
                            pa.field("to_zone", pa.string())])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = np.asarray(t[track_col], np.int64)
        okeys = [np.asarray(t[c]) for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (u,))
        u = u[order]
        e = np.asarray(t[event_col], np.int64)[order]
        z = np.asarray(t["zone"], dtype=object)[order]
        starts, _ = key_segments(u)
        change = np.r_[False, z[1:] != z[:-1]]
        change[starts] = False                 # no lag across tracks
        sel = np.flatnonzero(change)
        return pa.table({track_col: pa.array(u[sel]),
                         event_col: pa.array(e[sel]),
                         "from_zone": pa.array(z[sel - 1], pa.string()),
                         "to_zone": pa.array(z[sel], pa.string())})

    return (ds.sort(track_col)
              .map_batches(kernel, batch_format="pyarrow",
                           batch_size=None))


def zone_dwell_time(points_ds, polygons: list[dict],
                    track_col: str = "user_id",
                    order_cols=("ts", "event_id")):
    """Time-in-zone accounting: the interval between consecutive pings
    of a track is attributed to the FIRST ping's zone (step-function
    semantics; a track's last ping contributes nothing). → Dataset
    (zone, total_us, n_intervals) — exact int64 µs sums.

    Scale shape: broadcast zone assign (shared PIP index), ONE
    track-keyed sort exchange, whole-block lag kernel, per-block
    (zone, Σµs, n) partials, tiny O(zones) groupby sum."""
    from ray.data.aggregate import Sum
    ds = assign_zones(points_ds, polygons)

    def kernel(t: pa.Table) -> pa.Table:
        import pandas as pd
        if t.num_rows == 0:
            return pa.schema([pa.field("zone", pa.string()),
                              pa.field("total_us", pa.int64()),
                              pa.field("n_intervals", pa.int64())]
                             ).empty_table()
        u = np.asarray(t[track_col], np.int64)
        okeys = [np.asarray(t[c]) for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (u,))
        u = u[order]
        ts = np.asarray(t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)[order]
        z = np.asarray(t["zone"], dtype=object)[order]
        same = u[1:] == u[:-1]
        dur = (ts[1:] - ts[:-1])[same]
        zz = z[:-1][same]
        g = (pd.DataFrame({"zone": zz, "total_us": dur,
                           "n_intervals": 1})
             .groupby("zone", sort=False).sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.sort(track_col)
            .map_batches(kernel, batch_format="pyarrow",
                         batch_size=None)
            .groupby("zone")
            .aggregate(Sum("total_us", alias_name="total_us"),
                       Sum("n_intervals", alias_name="n_intervals")))


def od_matrix(points_ds, polygons: list[dict],
              track_col: str = "user_id", order_cols=("ts", "event_id"),
              cover_res: int = DEFAULT_COVER_RES):
    """Origin–destination matrix: → (from_zone, to_zone, n_trips) over
    the geofence transitions. Transition volume is corpus-scale but the
    zone-pair cardinality is O(zones²), so counts are pre-aggregated
    per block (the combiner rule) and the closing groupby shuffles one
    row per pair per block."""
    from ray.data.aggregate import Sum
    trans = geofence_transitions(points_ds, polygons,
                                 track_col=track_col,
                                 order_cols=order_cols,
                                 cover_res=cover_res)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "from_zone": t["from_zone"].to_numpy(zero_copy_only=False),
            "to_zone": t["to_zone"].to_numpy(zero_copy_only=False),
            "n_trips": 1})
        g = (df.groupby(["from_zone", "to_zone"], sort=False)
             .sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    return (trans.map_batches(partial, batch_format="pyarrow")
            .groupby(["from_zone", "to_zone"])
            .aggregate(Sum("n_trips", alias_name="n_trips")))


def zonal_mode(points_ds, polygons: list[dict],
               cat_col: str = "event_type",
               lat_col: str = "lat", lon_col: str = "lon"):
    """Zonal MAJORITY — the categorical zonal statistic: for every zone
    (admin polygon, plus the ``"none"`` outside-sentinel), the modal
    category of the points it contains, ties broken by the smaller
    category string (the deterministic GIS majority-filter rule).

    Scale shape: the broadcast PIP zone assign of
    :func:`assign_zones` (nothing corpus-sized moves), per-block
    (zone, category) count partials, one narrow groupby — the
    (zones × categories) table is dimension-sized, so the closing
    argmax is a driver frame op (the ``od_matrix`` precedent).

    → pandas (zone, mode_cat, n_mode, n_total) sorted by zone."""
    import pandas as pd
    from ray.data.aggregate import Sum

    assigned = assign_zones(points_ds, polygons,
                            lat_col=lat_col, lon_col=lon_col)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "zone": t["zone"].to_numpy(zero_copy_only=False),
            "cat": t[cat_col].to_numpy(zero_copy_only=False),
            "n": 1})
        g = df.groupby(["zone", "cat"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (assigned.map_batches(partial, batch_format="pyarrow")
              .groupby(["zone", "cat"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    if counts.empty:
        return pd.DataFrame({"zone": pd.Series(dtype=object),
                             "mode_cat": pd.Series(dtype=object),
                             "n_mode": pd.Series(dtype="int64"),
                             "n_total": pd.Series(dtype="int64")})
    counts = counts.sort_values(["zone", "n", "cat"],
                                ascending=[True, False, True])
    top = counts.groupby("zone", sort=True).first().reset_index()
    tot = counts.groupby("zone", sort=True)["n"].sum().reset_index(
        name="n_total")
    out = top.merge(tot, on="zone").rename(
        columns={"cat": "mode_cat", "n": "n_mode"})
    return out[["zone", "mode_cat", "n_mode", "n_total"]] \
        .reset_index(drop=True)
