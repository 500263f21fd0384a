"""Trajectory simplification — Douglas–Peucker (1973) polyline
reduction per track: keep a point iff dropping it would move the
polyline by more than ``eps`` (perpendicular distance to the chord of
its segment), recursing on the kept splits.

All geometry is compared in SQUARED form without division —
``cross² > eps² · |chord|²`` (point-to-point ``|p-a|² > eps²`` for the
zero-length chord) — a pure rational expression whose every operation
is IEEE exactly-rounded, so the keep-set is bit-identical in any
engine: the DuckDB oracle replays the recursion as a recursive CTE
(segments table seeded with track endpoints; each step splits at the
argmax-metric interior point, ties to the smallest sequence index).
Coordinates are treated as planar degrees (same documented convention
as :mod:`..joins.idw`).

Distribution: ONE sort exchange keyed on the track id alone (the
exchange-discipline rule — a composite key could split a track at a
range boundary), then a whole-block kernel. Within the block the
within-track order, track boundaries and output gather are single
numpy passes; the DP recursion itself runs per TRACK (a loop over
tracks, not rows — Douglas–Peucker is inherently per-polyline
recursive, O(n log n) typical, with all inner work vectorized over the
track's points).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .partition import key_segments


def douglas_peucker_keep(x: np.ndarray, y: np.ndarray,
                         eps: float) -> np.ndarray:
    """Boolean keep-mask for one polyline (points in path order).
    Endpoints are always kept; interior point ``m`` (first argmax)
    splits its segment iff metric(m) > eps² · denom."""
    n = len(x)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay = x[i], y[i]
        dx, dy = x[j] - ax, y[j] - ay
        len2 = dx * dx + dy * dy
        px = x[i + 1:j] - ax
        py = y[i + 1:j] - ay
        if len2 == 0.0:
            metric = px * px + py * py
            thresh = eps2
        else:
            cross = dx * py - dy * px
            metric = cross * cross
            thresh = eps2 * len2
        m = int(np.argmax(metric))           # first max = smallest seq
        if metric[m] > thresh:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_tracks(ds, eps: float, track_col: str = "user_id",
                    order_cols=("ts", "event_id"),
                    lat_col: str = "lat", lon_col: str = "lon",
                    keep_cols=("event_id",)):
    """→ (track_col, seq, *keep_cols, lat_col, lon_col) — the kept
    points of every track, ``seq`` being the 0-based within-track rank
    by ``order_cols``."""
    order_cols = list(order_cols)
    keep_cols = list(keep_cols)

    def kernel(t: pa.Table) -> pa.Table:
        u = np.asarray(t[track_col], np.int64)
        okeys = [np.asarray(t[c]) for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (u,))
        u = u[order]
        lat = np.asarray(t[lat_col], np.float64)[order]
        lon = np.asarray(t[lon_col], np.float64)[order]
        starts, seg = key_segments(u)
        idx = np.arange(len(u))
        seq = idx - starts[seg]
        keep = np.zeros(len(u), bool)
        for s, e in zip(starts, np.r_[starts[1:], len(u)]):
            keep[s:e] = douglas_peucker_keep(lat[s:e], lon[s:e], eps)
        sel = np.flatnonzero(keep)
        out = {track_col: pa.array(u[sel]),
               "seq": pa.array(seq[sel], pa.int64())}
        for c in keep_cols:
            out[c] = t[c].take(pa.array(order[sel], pa.int64()))
        out[lat_col] = pa.array(lat[sel], pa.float64())
        out[lon_col] = pa.array(lon[sel], pa.float64())
        return pa.table(out)

    return (ds.sort(track_col)
              .map_batches(kernel, batch_format="pyarrow",
                           batch_size=None))
