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
- Each segment scatters to the 1° cells its LINE PASSES THROUGH
  (row-span rasterization, vectorized ragged expansion — a widened
  superset of the true passage cover, see ``_passage_cells``). A
  k-cell-long diagonal chord emits O(k) rows, never the O(k²) its
  bbox covers — the scatter cost is the segment's length, not its
  area. Any intersection point lies on both segments, hence in a cell
  both passage covers contain — the bucket join loses nothing.
- Candidates are enumerated per cell inside hash-partitioned blocks
  (``partition.hash_partitioned`` co-locates each cell): the full m²
  index grid per cell is built with pure integer arithmetic (t//m,
  t%m) — no per-cell Python loop — then filtered to ``user_a <
  user_b`` and the exact predicate.
- No dedup shuffle: a crossing pair sharing several cells is claimed
  by the ONE half-open cell containing its intersection POINT,
  decided division-free in int64 — the point is ``(xn/D, yn/D)`` with
  ``D = d1 - d2`` (the predicate's own cross products), so
  ``lo·D ≤ xn < (lo+size)·D`` tests containment exactly
  (int64-exact for |coords| < 2^15; lat/lon ×8 is ≤ 1440). Each
  crossing therefore emits exactly once globally, and the
  per-user-pair rollup is per-block partial counts + ONE tiny groupby
  sum. The groupby runs on a rebuilt dataset (``drop_empty_blocks``)
  because the hash-shuffle strategy flip made for the cell
  repartition is a lineage-context property — chaining a groupby on
  the same lineage would re-enter the actor-pool hash aggregator for
  a kilobyte-sized reduce (measured: 38 s and ~250 worker spawns at
  sf0.001).
- Hot cells (many co-located segments) — the m² term — are REFINED,
  not suffered: a per-block partial count + O(occupied-cells) driver
  combine (the spatial-stats family's standard driver reduce) finds
  cells holding more than ``hot_cell_rows`` scattered segments, and
  those cells alone are re-scattered onto a ``refine × refine``
  subgrid with the SAME passage rasterization (a segment emits only
  the subcells it passes — O(refine), never refine²) and the SAME
  point claim at subcell bounds. A hot cell's m² pair grid becomes
  Σ mᵢ² over its passage-occupied subcells; because covers are
  passage-tight, mᵢ shrinks with subcell size even for chords that
  spanned the whole cell (which is where a bbox-scatter refinement
  provably cannot help: every full-cell chord's bbox covers every
  subcell, so bbox-refined groups stay size m — measured 10+ min vs
  seconds on the 20k-segment one-cell stress fixture).
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


def _passage_cells(x1, y1, x2, y2, bx, by, s, gmax):
    """Ragged passage cover of each segment on a square grid of side
    ``s`` anchored at the per-segment origin ``(bx, by)``; cell indices
    clamped to ``[0, gmax)`` when ``gmax > 0`` (hot-cell subgrid) or
    unbounded when ``gmax == 0`` (global grid, bx = by = 0).

    Row-span method: for every grid ROW the segment's y-extent touches
    (closed interval, so boundary tangencies are covered), the segment's
    x-range within that row comes from the line equation, widened by
    1e-6 before flooring — a strict SUPERSET of the true passage cells
    (≤ 1 spurious column per side per row; float error is ≤ ~1e-12 for
    the < 2^15 integer domain, far inside the widening), which is all
    the exact point claim downstream needs. Emits each (segment, cell)
    at most once. Returns ``(seg_idx, gx, gy)``."""
    n = x1.shape[0]
    bxl = np.minimum(x1, x2)
    bxh = np.maximum(x1, x2)
    ylo = np.minimum(y1, y2)
    yhi = np.maximum(y1, y2)
    if gmax:
        ylo = np.maximum(ylo, by)
        yhi = np.minimum(yhi, by + s * gmax)
    ry0 = (ylo - by) // s
    ry1 = (yhi - by) // s
    if gmax:
        ry0 = np.clip(ry0, 0, gmax - 1)
        ry1 = np.clip(ry1, 0, gmax - 1)
        nrows = np.where(ylo <= yhi, ry1 - ry0 + 1, 0)
    else:
        nrows = ry1 - ry0 + 1
    rep_r = np.repeat(np.arange(n), nrows)
    loc_r = np.arange(int(nrows.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(nrows) - nrows, nrows)
    gy = ry0[rep_r] + loc_r
    row_lo = by[rep_r] + gy * s
    # continuous y-window of this row ∩ segment, then x at its ends
    ya = np.maximum(ylo[rep_r], row_lo).astype(np.float64)
    yb = np.minimum(yhi[rep_r], row_lo + s).astype(np.float64)
    dy = (y2 - y1)[rep_r].astype(np.float64)
    dx = (x2 - x1)[rep_r].astype(np.float64)
    x1f = x1[rep_r].astype(np.float64)
    y1f = y1[rep_r].astype(np.float64)
    horiz = dy == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        xa = np.where(horiz, bxl[rep_r], x1f + (ya - y1f) * dx / dy)
        xb = np.where(horiz, bxh[rep_r], x1f + (yb - y1f) * dx / dy)
    xlo = np.maximum(np.minimum(xa, xb) - 1e-6, bxl[rep_r])
    xhi = np.minimum(np.maximum(xa, xb) + 1e-6, bxh[rep_r])
    bx_r = bx[rep_r]
    gx0 = np.floor((xlo - bx_r) / s).astype(np.int64)
    gx1 = np.floor((xhi - bx_r) / s).astype(np.int64)
    if gmax:
        gx0 = np.clip(gx0, 0, gmax - 1)
        gx1 = np.clip(gx1, 0, gmax - 1)
    ncols = gx1 - gx0 + 1
    rep2 = np.repeat(np.arange(gy.shape[0]), ncols)
    loc2 = np.arange(int(ncols.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(ncols) - ncols, ncols)
    return rep_r[rep2], gx0[rep2] + loc2, gy[rep2]


def _scatter_cells(t: pa.Table, track_col: str) -> pa.Table:
    x1 = np.asarray(t["x1"], np.int64)
    y1 = np.asarray(t["y1"], np.int64)
    x2 = np.asarray(t["x2"], np.int64)
    y2 = np.asarray(t["y2"], np.int64)
    zeros = np.zeros(x1.shape[0], np.int64)
    rep, cx, cy = _passage_cells(x1, y1, x2, y2, zeros, zeros,
                                 np.int64(8), 0)
    out = {c: pa.array(np.asarray(t[c])[rep]) for c in t.column_names}
    out["cx"], out["cy"] = pa.array(cx), pa.array(cy)
    return pa.table(out)


_CELL_PACK = np.int64(1) << 21
_CELL_OFF = np.int64(1) << 20


def _pack_cells(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """(cx, cy) → one int64 key (cells are degree-scale, |c| << 2^20)."""
    return (cx + _CELL_OFF) * _CELL_PACK + (cy + _CELL_OFF)


def _hot_cells(cov, hot_cell_rows: int) -> np.ndarray:
    """Packed keys of cells holding > ``hot_cell_rows`` scattered rows.

    Per-block ``np.unique`` partials, one driver combine over
    O(occupied cells × blocks) rows — the same bounded driver reduce
    the spatial-stats family uses for its cell tables."""
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        pack = _pack_cells(np.asarray(t["cx"], np.int64),
                           np.asarray(t["cy"], np.int64))
        cells, counts = np.unique(pack, return_counts=True)
        return pa.table({"cell": pa.array(cells),
                         "n": pa.array(counts.astype(np.int64))})

    parts = cov.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return np.empty(0, np.int64)
    tot = parts.groupby("cell")["n"].sum()
    return np.sort(tot.index[tot > hot_cell_rows].to_numpy(np.int64))


def _refine_hot(t: pa.Table, hot: np.ndarray, refine: int) -> pa.Table:
    """Re-scatter rows that landed in a hot cell onto the subcells of
    that cell's ``refine × refine`` grid the segment PASSES THROUGH
    (subcell side ``8 // refine`` integer units, same row-span
    rasterization as the coarse scatter); cold rows pass through with
    fx = fy = -1."""
    cols = t.column_names
    cx = np.asarray(t["cx"], np.int64)
    cy = np.asarray(t["cy"], np.int64)
    ishot = np.isin(_pack_cells(cx, cy), hot) if len(hot) else \
        np.zeros(len(cx), bool)
    neg = pa.array(np.full(int((~ishot).sum()), -1, np.int64))
    cold = t.filter(pa.array(~ishot))
    cold = pa.table({**{c: cold[c] for c in cols}, "fx": neg, "fy": neg})
    if not ishot.any():
        return cold
    h = t.filter(pa.array(ishot))
    s = np.int64(8 // refine)
    rep, fx, fy = _passage_cells(
        np.asarray(h["x1"], np.int64), np.asarray(h["y1"], np.int64),
        np.asarray(h["x2"], np.int64), np.asarray(h["y2"], np.int64),
        np.asarray(h["cx"], np.int64) * 8,
        np.asarray(h["cy"], np.int64) * 8, s, refine)
    fine = pa.table({**{c: pa.array(np.asarray(h[c])[rep]) for c in cols},
                     "fx": pa.array(fx), "fy": pa.array(fy)})
    return pa.concat_tables([cold, fine])


def _proper_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    d1 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d2 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    d3 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d4 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    return (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))


def _cell_pairs_kernel(t: pa.Table, track_col: str,
                       refine: int) -> pa.Table:
    if t.num_rows == 0:
        return _CAND_SCHEMA.empty_table()
    cx = np.asarray(t["cx"], np.int64)
    cy = np.asarray(t["cy"], np.int64)
    fx = np.asarray(t["fx"], np.int64)
    fy = np.asarray(t["fy"], np.int64)
    order = np.lexsort((fy, fx, cy, cx))
    u = np.asarray(t[track_col], np.int64)[order]
    e = np.asarray(t["eid"], np.int64)[order]
    x1 = np.asarray(t["x1"], np.int64)[order]
    y1 = np.asarray(t["y1"], np.int64)[order]
    x2 = np.asarray(t["x2"], np.int64)[order]
    y2 = np.asarray(t["y2"], np.int64)[order]
    cx, cy, fx, fy = cx[order], cy[order], fx[order], fy[order]
    new = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])
                | (fx[1:] != fx[:-1]) | (fy[1:] != fy[:-1])]
    starts = np.flatnonzero(new)
    m = np.r_[starts[1:], len(u)] - starts
    # m² index grids per cell, pure integer decode (i = t//m, j = t%m),
    # enumerated in bounded SLICES of the global pair space (≤ 2^26
    # pairs ≈ 0.5 GB of transient index arrays per slice — a residual
    # hot SUBcell can hold tens of thousands of rows, and one monolithic
    # grid over it would allocate tens of GB), then the cheap canonical
    # filter user_a < user_b
    n2 = m * m
    off = np.cumsum(n2) - n2
    total = int(n2.sum())
    step = 1 << 26
    parts_i, parts_j = [], []
    for lo in range(0, total, step):
        hi = min(lo + step, total)
        tglob = np.arange(lo, hi, dtype=np.int64)
        g = np.searchsorted(off, tglob, side="right") - 1
        tloc = tglob - off[g]
        ii = starts[g] + tloc // m[g]
        jj = starts[g] + tloc % m[g]
        keep = u[ii] < u[jj]
        parts_i.append(ii[keep])
        parts_j.append(jj[keep])
    i = np.concatenate(parts_i) if parts_i else np.empty(0, np.int64)
    j = np.concatenate(parts_j) if parts_j else np.empty(0, np.int64)
    # exact predicate first (its cross products feed the claim)
    d1 = (x2[j] - x1[j]) * (y1[i] - y1[j]) \
        - (y2[j] - y1[j]) * (x1[i] - x1[j])
    d2 = (x2[j] - x1[j]) * (y2[i] - y1[j]) \
        - (y2[j] - y1[j]) * (x2[i] - x1[j])
    d3 = (x2[i] - x1[i]) * (y1[j] - y1[i]) \
        - (y2[i] - y1[i]) * (x1[j] - x1[i])
    d4 = (x2[i] - x1[i]) * (y2[j] - y1[i]) \
        - (y2[i] - y1[i]) * (x2[j] - x1[i])
    hit = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    i, j, d1, d2 = i[hit], j[hit], d1[hit], d2[hit]
    # point claim: the crossing is P = A1 + t(A2-A1), t = d1/(d1-d2);
    # containment in this group's half-open cell is tested on the
    # D-scaled numerators, division-free and exact in int64 for the
    # |coord| < 2^15 geo domain (module docstring)
    big = d1 - d2
    xn = x1[i] * big + d1 * (x2[i] - x1[i])
    yn = y1[i] * big + d1 * (y2[i] - y1[i])
    flip = big < 0
    big = np.where(flip, -big, big)
    xn = np.where(flip, -xn, xn)
    yn = np.where(flip, -yn, yn)
    sub = np.int64(8 // refine)
    refined = fx[i] >= 0
    lox = cx[i] * 8 + np.where(refined, fx[i] * sub, 0)
    loy = cy[i] * 8 + np.where(refined, fy[i] * sub, 0)
    size = np.where(refined, sub, np.int64(8))
    claim = (lox * big <= xn) & (xn < (lox + size) * big) \
        & (loy * big <= yn) & (yn < (loy + size) * big)
    i, j = i[claim], j[claim]
    return pa.table({"ua": pa.array(u[i]), "ea": pa.array(e[i]),
                     "ub": pa.array(u[j]), "eb": pa.array(e[j])})


def crossing_join(points_ds, track_col: str = "user_id",
                  order_cols=("ts", "event_id"),
                  event_col: str = "event_id",
                  hot_cell_rows: int | None = 10_000, refine: int = 4):
    """``points_ds`` needs (track, order cols, x, y ×8-integer coords).
    → Dataset (user_a, user_b, n_crossings): per unordered track pair,
    the number of distinct properly-intersecting segment pairs.

    Cells holding more than ``hot_cell_rows`` scattered segments are
    re-scattered onto a ``refine × refine`` subgrid (module docstring:
    hierarchical owner claim, exact at any threshold). ``refine`` must
    divide the 8-unit cell side; ``hot_cell_rows=None`` disables
    refinement (every cell cold). The default threshold matches
    ``rows_per_partition`` — a cell is refined exactly when it alone
    would overflow its partition's pair budget."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.partition import drop_empty_blocks

    if refine not in (2, 4, 8):
        raise ValueError(f"refine must divide the 8-unit cell: {refine}")
    segs = (points_ds.sort(track_col)
            .map_batches(lambda t: _segments_kernel(
                             t, track_col, list(order_cols), event_col),
                         batch_format="pyarrow", batch_size=None))
    cov = segs.map_batches(
        lambda t: _scatter_cells(t, track_col), batch_format="pyarrow")
    # pin: the count pass and the refine pass both consume cov
    cov = cov.materialize()
    hot = _hot_cells(cov, hot_cell_rows) if hot_cell_rows is not None \
        else np.empty(0, np.int64)
    hot_ref = ray.put(hot)

    def refine_pass(t: pa.Table) -> pa.Table:
        return _refine_hot(t, ray.get(hot_ref), refine)

    cov = cov.map_batches(refine_pass, batch_format="pyarrow")
    # pair work is QUADRATIC per cell, so partitions are sized far
    # below the row-count default — 10k cover rows/partition keeps all
    # cores busy (measured: the 100k default left 32 cores running 6
    # tasks, 70 s for a 7 s workload)
    buckets = hash_partitioned(cov, ["cx", "cy", "fx", "fy"],
                               rows_per_partition=10_000)
    if buckets is None:
        return None

    def partial_counts(t: pa.Table) -> pa.Table:
        hits = _cell_pairs_kernel(t, track_col, refine)
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


def convoy_pairs(points_ds, bucket_us: int = 3_600_000_000,
                 min_len: int = 3, track_col: str = "user_id"):
    """Convoy (travelling-companion) detection: unordered user pairs
    co-located — same 1° cell, same time bucket — in at least
    ``min_len`` CONSECUTIVE buckets, the sequential strengthening of
    :func:`colocation_join` (a pair meeting once an hour at random
    never forms a convoy; a pair moving together does). The shared
    cell may CHANGE bucket to bucket — consecutiveness is a property
    of the pair's bucket set, not of any one cell.

    Scale shape: the colocation presence combiner + ONE slot-keyed
    exchange emit (user_a, user_b, bucket) rows (deduped in-block —
    a pair sharing k cells in one bucket collapses before the next
    exchange, k ≤ the pair's per-bucket cell fan-out, tiny for point
    data); ONE pair-keyed exchange then sorts each pair's buckets and
    the longest consecutive run is a whole-block vectorized
    gaps-and-islands (two ``reduceat`` levels: runs within pair, max
    over runs). Narrow int64 rows end to end; no driver collection.

    → Dataset (user_a, user_b, max_run, n_buckets), pairs with
    ``max_run >= min_len``.
    """
    import pandas as pd

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
    slots = hash_partitioned(pres, ["cx", "cy", "b"],
                             rows_per_partition=10_000)
    if slots is None:
        return None

    pair_schema = pa.schema([pa.field("ua", pa.int64()),
                             pa.field("ub", pa.int64()),
                             pa.field("b", pa.int64())])

    def slot_pair_buckets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        b = np.asarray(t["b"], np.int64)
        u = np.asarray(t["u"], np.int64)
        order = np.lexsort((u, b, cy, cx))
        cx, cy, b, u = cx[order], cy[order], b[order], u[order]
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
        df = (pd.DataFrame({"ua": u[i], "ub": u[j], "b": b[i]})
              .drop_duplicates())
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = slots.map_batches(slot_pair_buckets, batch_format="pyarrow",
                             batch_size=None)
    clean = drop_empty_blocks(cand)
    if clean is None:
        return None
    pairs = hash_partitioned(clean, ["ua", "ub"])
    if pairs is None:
        return None

    out_schema = pa.schema([pa.field("user_a", pa.int64()),
                            pa.field("user_b", pa.int64()),
                            pa.field("max_run", pa.int64()),
                            pa.field("n_buckets", pa.int64())])

    def runs_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ua = np.asarray(t["ua"], np.int64)
        ub = np.asarray(t["ub"], np.int64)
        b = np.asarray(t["b"], np.int64)
        order = np.lexsort((b, ub, ua))
        ua, ub, b = ua[order], ub[order], b[order]
        # cross-block duplicate (pair, bucket) rows: in-block dedup
        # upstream ran per slot-exchange block, the same pair+bucket can
        # arrive from two cells in different blocks
        dup = np.r_[False, (ua[1:] == ua[:-1]) & (ub[1:] == ub[:-1])
                    & (b[1:] == b[:-1])]
        ua, ub, b = ua[~dup], ub[~dup], b[~dup]
        newp = np.r_[True, (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])]
        newrun = newp | np.r_[True, b[1:] != b[:-1] + 1]
        run_starts = np.flatnonzero(newrun)
        run_len = np.r_[run_starts[1:], len(b)] - run_starts
        # runs are contiguous per pair: reduce run lengths by pair
        pair_first = np.flatnonzero(newp)            # row index
        pair_run0 = np.searchsorted(run_starts, pair_first)
        max_run = np.maximum.reduceat(run_len, pair_run0)
        n_buckets = np.add.reduceat(run_len, pair_run0)
        keep = max_run >= min_len
        return pa.table({"user_a": pa.array(ua[pair_first][keep]),
                         "user_b": pa.array(ub[pair_first][keep]),
                         "max_run": pa.array(max_run[keep]),
                         "n_buckets": pa.array(n_buckets[keep])})

    return pairs.map_batches(runs_kernel, batch_format="pyarrow",
                             batch_size=None)
