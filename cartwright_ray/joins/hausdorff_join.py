"""Track-similarity join — symmetric Hausdorff distance between user
trajectories, emitting pairs within a threshold (the classic
trajectory-clustering primitive; no reference analogue — the
reference's geo layer stops at column classification).

Exactness: coordinates are ×8 integers (``track_extent`` convention),
distances are SQUARED int64 (``dx² + dy²``), and the directed Hausdorff
h²(A→B) = max over a∈A of min over b∈B of d²(a,b) is pure integer
max/min — bit-identical to the DuckDB min/max-groupby replay. The
symmetric value is ``max(h²(A→B), h²(B→A))``.

Scale shape:

- ONE track-keyed sort exchange folds each track into a single row
  (user, xs, ys, bbox) — the TRACK TABLE, |users| rows. All pairwise
  work then runs on this table, never on the point set.
- Candidate pruning is exact and engine-replayable: pair (A, B) is
  evaluated iff their bboxes EXPANDED BY the threshold intersect — a
  necessary condition for symmetric Hausdorff ≤ threshold (if h ≤ T,
  every point of A is within T of B's bbox, so A's bbox ⊆ B's bbox ⊕ T
  and vice versa).
- The track table is broadcast via ``ray.put`` and each block computes
  its rows × broadcast rows with ``user_a < user_b`` — the documented
  BROADCAST-plan bound (table bytes ≈ users × track-length × 16; at
  billions of users switch to a grid-bucketed pair plan, the
  crossing_join pattern). Per-pair h² is one vectorized (|A|·|B|)
  distance matrix — no Python loop over points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT_SCHEMA = pa.schema([pa.field("user_a", pa.int64()),
                         pa.field("user_b", pa.int64()),
                         pa.field("h2", pa.int64())])


def _track_rows(t: pa.Table, track_col: str, order_cols) -> pa.Table:
    if t.num_rows == 0:
        return pa.schema([pa.field(track_col, pa.int64()),
                          pa.field("xs", pa.list_(pa.int64())),
                          pa.field("ys", pa.list_(pa.int64())),
                          pa.field("xmin", pa.int64()),
                          pa.field("xmax", pa.int64()),
                          pa.field("ymin", pa.int64()),
                          pa.field("ymax", pa.int64())]).empty_table()
    u = np.asarray(t[track_col], np.int64)
    okeys = [np.asarray(t[c]) for c in order_cols]
    order = np.lexsort(tuple(reversed(okeys)) + (u,))
    u = u[order]
    x = np.asarray(t["x"], np.int64)[order]
    y = np.asarray(t["y"], np.int64)[order]
    new = np.r_[True, u[1:] != u[:-1]]
    starts = np.flatnonzero(new)
    offsets = np.r_[starts, len(u)].astype(np.int32)
    return pa.table({
        track_col: pa.array(u[starts]),
        "xs": pa.ListArray.from_arrays(pa.array(offsets), pa.array(x)),
        "ys": pa.ListArray.from_arrays(pa.array(offsets), pa.array(y)),
        "xmin": pa.array(np.minimum.reduceat(x, starts)),
        "xmax": pa.array(np.maximum.reduceat(x, starts)),
        "ymin": pa.array(np.minimum.reduceat(y, starts)),
        "ymax": pa.array(np.maximum.reduceat(y, starts))})


def _h2_directed(ax, ay, bx, by) -> int:
    dx = ax[:, None] - bx
    dy = ay[:, None] - by
    return int((dx * dx + dy * dy).min(axis=1).max())


def hausdorff_join(points_ds, threshold: int,
                   track_col: str = "user_id",
                   order_cols=("ts", "event_id")):
    """``points_ds`` needs (track, order cols, x, y ×8-integer coords).
    → Dataset (user_a, user_b, h2): unordered track pairs with
    symmetric Hausdorff² ≤ ``threshold``² (threshold in the same ×8
    integer units)."""
    import ray

    tracks = (points_ds.sort(track_col)
              .map_batches(lambda t: _track_rows(t, track_col,
                                                 list(order_cols)),
                           batch_format="pyarrow", batch_size=None))
    track_ref = ray.put(tracks.to_pandas())
    t2 = int(threshold) * int(threshold)

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        all_df = ray.get(track_ref)
        au = np.asarray(t[track_col], np.int64)
        axs = t["xs"].to_pylist()
        ays = t["ys"].to_pylist()
        axmin = np.asarray(t["xmin"], np.int64)
        axmax = np.asarray(t["xmax"], np.int64)
        aymin = np.asarray(t["ymin"], np.int64)
        aymax = np.asarray(t["ymax"], np.int64)
        bu = all_df[track_col].to_numpy()
        bxmin = all_df["xmin"].to_numpy()
        bxmax = all_df["xmax"].to_numpy()
        bymin = all_df["ymin"].to_numpy()
        bymax = all_df["ymax"].to_numpy()
        out_a, out_b, out_h = [], [], []
        thr = int(threshold)
        for i in range(len(au)):
            # canonical user_a < user_b + expanded-bbox prefilter
            cand = np.flatnonzero(
                (au[i] < bu)
                & (axmin[i] <= bxmax + thr) & (axmax[i] >= bxmin - thr)
                & (aymin[i] <= bymax + thr) & (aymax[i] >= bymin - thr))
            if not len(cand):
                continue
            ax = np.asarray(axs[i], np.int64)
            ay = np.asarray(ays[i], np.int64)
            for j in cand:
                bx = np.asarray(all_df["xs"].iloc[j], np.int64)
                by = np.asarray(all_df["ys"].iloc[j], np.int64)
                h2 = max(_h2_directed(ax, ay, bx, by),
                         _h2_directed(bx, by, ax, ay))
                if h2 <= t2:
                    out_a.append(au[i])
                    out_b.append(int(bu[j]))
                    out_h.append(h2)
        return pa.table({"user_a": pa.array(out_a, pa.int64()),
                         "user_b": pa.array(out_b, pa.int64()),
                         "h2": pa.array(out_h, pa.int64())})

    return tracks.map_batches(pairs, batch_format="pyarrow")
