"""Trajectory crossing join — pairs of tracks whose movement segments
properly intersect (the segment-intersection spatial join; reference's
geo layer has no analogue — engine north-star surface).

Geometry is EXACT: coordinates are ×8 integers (the 0.125°-multiple
testdata convention of ``track_extent``) and the proper-intersection
predicate is four integer cross products with strict sign opposition —
collinear touches and endpoint grazes are NOT crossings (documented
boundary semantics; keeps the predicate rational, hence bit-identical
in numpy and DuckDB).

Scale shape (the standard cell-bucketed spatial join):

- Segments come off ONE track-keyed sort exchange (the
  exchange-discipline kernel: lexsort within block, neighbor rows of
  the same user form a segment).
- Each segment scatters to the 1° cells of its bbox (vectorized ragged
  expansion); any intersection point lies on both segments, hence in a
  cell BOTH bbox covers contain — the bucket join loses nothing.
- Candidates are enumerated per cell inside hash-partitioned blocks
  (``partition.hash_partitioned`` co-locates each cell): the full m²
  index grid per cell is built with pure integer arithmetic (t//m,
  t%m) — no per-cell Python loop — then filtered to ``user_a <
  user_b`` and the exact predicate.
- No dedup shuffle: a pair sharing several cells is claimed by its
  OWNER cell only — the lexicographically smallest shared cover cell
  ``(max(cx0_a, cx0_b), max(cy0_a, cy0_b))`` (cover regions are bbox
  rectangles, so their intersection starts at the max of the mins and
  is non-empty for every candidate). Each crossing therefore emits
  exactly once globally, and the per-user-pair rollup is per-block
  partial counts + ONE tiny groupby sum. The groupby runs on a
  rebuilt dataset (``drop_empty_blocks``) because the hash-shuffle
  strategy flip made for the cell repartition is a lineage-context
  property — chaining a groupby on the same lineage would re-enter
  the actor-pool hash aggregator for a kilobyte-sized reduce
  (measured: 38 s and ~250 worker spawns at sf0.001).
- Hot cells (many co-located segments) are the documented skew
  surface — the m² term; salt or refine the grid when one cell
  dominates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.partition import hash_partitioned

_CAND_SCHEMA = pa.schema([
    pa.field("ua", pa.int64()), pa.field("ea", pa.int64()),
    pa.field("ub", pa.int64()), pa.field("eb", pa.int64())])


def _segments_kernel(t: pa.Table, track_col: str, order_cols,
                     event_col: str) -> pa.Table:
    if t.num_rows == 0:
        return pa.schema([pa.field(track_col, pa.int64()),
                          pa.field("eid", pa.int64()),
                          pa.field("x1", pa.int64()),
                          pa.field("y1", pa.int64()),
                          pa.field("x2", pa.int64()),
                          pa.field("y2", pa.int64())]).empty_table()
    u = np.asarray(t[track_col], np.int64)
    okeys = [np.asarray(t[c]) for c in order_cols]
    order = np.lexsort(tuple(reversed(okeys)) + (u,))
    u = u[order]
    e = np.asarray(t[event_col], np.int64)[order]
    x = np.asarray(t["x"], np.int64)[order]
    y = np.asarray(t["y"], np.int64)[order]
    same = u[1:] == u[:-1]
    return pa.table({track_col: pa.array(u[1:][same]),
                     "eid": pa.array(e[1:][same]),
                     "x1": pa.array(x[:-1][same]),
                     "y1": pa.array(y[:-1][same]),
                     "x2": pa.array(x[1:][same]),
                     "y2": pa.array(y[1:][same])})


def _scatter_cells(t: pa.Table, track_col: str) -> pa.Table:
    x1 = np.asarray(t["x1"], np.int64)
    y1 = np.asarray(t["y1"], np.int64)
    x2 = np.asarray(t["x2"], np.int64)
    y2 = np.asarray(t["y2"], np.int64)
    cx0 = np.minimum(x1, x2) // 8
    cx1 = np.maximum(x1, x2) // 8
    cy0 = np.minimum(y1, y2) // 8
    cy1 = np.maximum(y1, y2) // 8
    nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
    n = nx * ny
    rep = np.repeat(np.arange(len(n)), n)
    # local cell index within each segment's bbox grid
    local = np.arange(int(n.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(n) - n, n)
    cx = cx0[rep] + local % nx[rep]
    cy = cy0[rep] + local // nx[rep]
    out = {c: pa.array(np.asarray(t[c])[rep]) for c in t.column_names}
    out["cx"], out["cy"] = pa.array(cx), pa.array(cy)
    out["cx0"], out["cy0"] = pa.array(cx0[rep]), pa.array(cy0[rep])
    return pa.table(out)


def _proper_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    d1 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d2 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    d3 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d4 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    return (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))


def _cell_pairs_kernel(t: pa.Table, track_col: str) -> pa.Table:
    if t.num_rows == 0:
        return _CAND_SCHEMA.empty_table()
    cx = np.asarray(t["cx"], np.int64)
    cy = np.asarray(t["cy"], np.int64)
    order = np.lexsort((cy, cx))
    u = np.asarray(t[track_col], np.int64)[order]
    e = np.asarray(t["eid"], np.int64)[order]
    x1 = np.asarray(t["x1"], np.int64)[order]
    y1 = np.asarray(t["y1"], np.int64)[order]
    x2 = np.asarray(t["x2"], np.int64)[order]
    y2 = np.asarray(t["y2"], np.int64)[order]
    cx0 = np.asarray(t["cx0"], np.int64)[order]
    cy0 = np.asarray(t["cy0"], np.int64)[order]
    cx, cy = cx[order], cy[order]
    new = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])]
    starts = np.flatnonzero(new)
    m = np.r_[starts[1:], len(u)] - starts
    # full m² index grid per cell, pure integer decode (i = t//m, j =
    # t%m), then the cheap canonical filter user_a < user_b
    n2 = m * m
    rep = np.repeat(np.arange(len(m)), n2)
    tloc = np.arange(int(n2.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(n2) - n2, n2)
    i = starts[rep] + tloc // m[rep]
    j = starts[rep] + tloc % m[rep]
    keep = u[i] < u[j]
    # owner-cell claim: only the smallest shared cover cell reports
    keep &= (cx[i] == np.maximum(cx0[i], cx0[j])) \
        & (cy[i] == np.maximum(cy0[i], cy0[j]))
    i, j = i[keep], j[keep]
    hit = _proper_intersect(x1[i], y1[i], x2[i], y2[i],
                            x1[j], y1[j], x2[j], y2[j])
    i, j = i[hit], j[hit]
    return pa.table({"ua": pa.array(u[i]), "ea": pa.array(e[i]),
                     "ub": pa.array(u[j]), "eb": pa.array(e[j])})


def crossing_join(points_ds, track_col: str = "user_id",
                  order_cols=("ts", "event_id"),
                  event_col: str = "event_id"):
    """``points_ds`` needs (track, order cols, x, y ×8-integer coords).
    → Dataset (user_a, user_b, n_crossings): per unordered track pair,
    the number of distinct properly-intersecting segment pairs."""
    from ray.data.aggregate import Sum

    from ..stages.partition import drop_empty_blocks

    segs = (points_ds.sort(track_col)
            .map_batches(lambda t: _segments_kernel(
                             t, track_col, list(order_cols), event_col),
                         batch_format="pyarrow", batch_size=None))
    cov = segs.map_batches(
        lambda t: _scatter_cells(t, track_col), batch_format="pyarrow")
    # pair work is QUADRATIC per cell, so partitions are sized far
    # below the row-count default — 10k cover rows/partition keeps all
    # cores busy (measured: the 100k default left 32 cores running 6
    # tasks, 70 s for a 7 s workload)
    buckets = hash_partitioned(cov, ["cx", "cy"],
                               rows_per_partition=10_000)
    if buckets is None:
        return None

    def partial_counts(t: pa.Table) -> pa.Table:
        hits = _cell_pairs_kernel(t, track_col)
        import pandas as pd
        df = pd.DataFrame({"user_a": hits["ua"].to_numpy(),
                           "user_b": hits["ub"].to_numpy(),
                           "n_crossings": 1})
        g = (df.groupby(["user_a", "user_b"], sort=False)
             .sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = buckets.map_batches(partial_counts, batch_format="pyarrow",
                                   batch_size=None)
    # rebuild before the groupby: the hash-shuffle strategy flip made
    # for the cell repartition is a lineage-context property (see
    # module docstring — 38 s of actor spawns otherwise)
    clean = drop_empty_blocks(partials)
    if clean is None:
        return None
    return (clean.groupby(["user_a", "user_b"])
            .aggregate(Sum("n_crossings", alias_name="n_crossings")))


def colocation_join(points_ds, bucket_us: int = 3_600_000_000,
                    track_col: str = "user_id"):
    """Co-location (contact) join: unordered user pairs observed in the
    SAME 1° cell during the SAME time bucket (default 1 hour), with the
    number of distinct co-located (cell, bucket) slots.

    Scale shape: points dedup to (user, cell, bucket) presence rows
    inside each block (combiner), one hash exchange co-locates each
    (cell, bucket) slot, the within-slot pair expansion is the m²
    integer-decode kernel, and the per-pair rollup is per-block
    partials + one tiny groupby sum on a context-reset rebuild (see
    module docstring). A pair meeting in k slots counts k — slots are
    disjoint by construction, so no dedup exchange is needed.

    → Dataset (user_a, user_b, n_slots)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.partition import drop_empty_blocks

    def presence(t: pa.Table) -> pa.Table:
        u = np.asarray(t[track_col], np.int64)
        cx = np.asarray(t["x"], np.int64) // 8
        cy = np.asarray(t["y"], np.int64) // 8
        ts = np.asarray(t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        b = ts // bucket_us
        df = (pd.DataFrame({"u": u, "cx": cx, "cy": cy, "b": b})
              .drop_duplicates())
        return pa.Table.from_pandas(df, preserve_index=False)

    pres = points_ds.map_batches(presence, batch_format="pyarrow")
    buckets = hash_partitioned(pres, ["cx", "cy", "b"],
                               rows_per_partition=10_000)
    if buckets is None:
        return None

    def slot_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([pa.field("user_a", pa.int64()),
                              pa.field("user_b", pa.int64()),
                              pa.field("n_slots", pa.int64())]
                             ).empty_table()
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        b = np.asarray(t["b"], np.int64)
        u = np.asarray(t["u"], np.int64)
        order = np.lexsort((u, b, cy, cx))
        cx, cy, b, u = cx[order], cy[order], b[order], u[order]
        # cross-block duplicate presences are impossible (hash exchange
        # co-locates the slot; in-block dedup above) but same-slot
        # same-user duplicates from different blocks are: drop them
        same_prev = np.r_[False, (cx[1:] == cx[:-1]) & (cy[1:] == cy[:-1])
                          & (b[1:] == b[:-1]) & (u[1:] == u[:-1])]
        cx, cy, b, u = (cx[~same_prev], cy[~same_prev], b[~same_prev],
                        u[~same_prev])
        new = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])
                    | (b[1:] != b[:-1])]
        starts = np.flatnonzero(new)
        m = np.r_[starts[1:], len(u)] - starts
        n2 = m * m
        rep = np.repeat(np.arange(len(m)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        i = starts[rep] + tloc // m[rep]
        j = starts[rep] + tloc % m[rep]
        keep = u[i] < u[j]
        i, j = i[keep], j[keep]
        df = (pd.DataFrame({"user_a": u[i], "user_b": u[j], "n_slots": 1})
              .groupby(["user_a", "user_b"], sort=False)
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = buckets.map_batches(slot_pairs, batch_format="pyarrow",
                                   batch_size=None)
    clean = drop_empty_blocks(partials)
    if clean is None:
        return None
    return (clean.groupby(["user_a", "user_b"])
            .aggregate(Sum("n_slots", alias_name="n_slots")))
