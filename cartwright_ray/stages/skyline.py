"""Skyline (Pareto frontier) query — maximize two dimensions, the
classic Börzsönyi/Kossmann/Stocker (ICDE 2001) operator, in its
distributed partial-skyline form: the global skyline is a subset of the
union of per-block local skylines, so one vectorized local pass per
block followed by the same kernel over the (tiny) union is exact.

Dominance (maximize both): a dominates b iff a.x >= b.x and a.y >= b.y
and at least one is strict. Rows with exactly equal (x, y) do not
dominate each other — ALL coordinate-tied frontier rows are returned
(the SQL NOT-EXISTS replay has the same tie semantics).

The local kernel is O(n log n) and fully vectorized: sort by x desc /
y desc, take per-distinct-x max-y group heads, and keep a group iff its
max-y strictly exceeds the running max over strictly-greater-x groups
(equality loses — the earlier group's x is strictly greater, so it
dominates). Within a surviving group, rows tied at the group max-y
survive; lower-y rows are dominated by the same-x head.

Scale shape: stage 1 is embarrassingly parallel over blocks and emits
per-block frontiers (for randomly-ordered data, expected O(log² n) rows
each); stage 2 runs the identical kernel over the concatenated partials
in one task (``repartition(1)``) — nothing through the driver. Adversely
sorted data can inflate partials up to block size; the worst case is a
fully-correlated input where the frontier IS the dataset, which no
skyline algorithm compresses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _frontier_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the maximize-(x,y) skyline rows."""
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((y, x))[::-1]        # x desc, then y desc
    xs, ys = x[order], y[order]
    head = np.r_[True, xs[1:] != xs[:-1]]   # first row of each x-group
    gid = np.cumsum(head) - 1
    gmax = ys[head]                          # y desc in-group → head=max
    # strict improvement over the running max of strictly-greater-x
    # groups (dtype-preserving: no -inf sentinel, ints stay exact)
    good = np.r_[True, gmax[1:] > np.maximum.accumulate(gmax)[:-1]]
    keep_sorted = good[gid] & (ys == gmax[gid])
    mask = np.zeros(n, bool)
    mask[order[keep_sorted]] = True
    return mask


def skyline_max(ds, x_col: str, y_col: str) -> pa.Table:
    """Skyline of ``ds`` maximizing (``x_col``, ``y_col``); both must be
    numeric (timestamps: cast to int64 upstream). Returns the surviving
    rows with their original columns as one small Arrow table."""
    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        mask = _frontier_mask(np.asarray(t[x_col]), np.asarray(t[y_col]))
        return t.filter(pa.array(mask))

    partial = ds.map_batches(local, batch_format="pyarrow",
                             batch_size=None)
    final = partial.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None)
    parts = [t for t in final.iter_batches(batch_format="pyarrow",
                                           batch_size=None)
             if t.num_rows]
    if not parts:
        return ds.limit(0).to_pandas().pipe(
            lambda df: pa.Table.from_pandas(df, preserve_index=False))
    return pa.concat_tables(parts)
