"""Snap-to-segment map matching — each point joins its nearest road
SEGMENT within a fixed radius (the nearest-feature enrichment of the
north star, extended from point targets to line geometry; reference
jataware/cartwright has no joins at all — engine surface).

Exactness: coordinates are ×8 integers. Point-to-segment distance² is
the exact rational ``(|ap|²·len2 − dot²) / len2`` on the interior
branch and the exact integer endpoint distance² on the clamped
branches — every numerator/denominator fits int64 for the geo domain
(|coord| ≤ 2^15: |ap|²·len2 ≤ 2^49). The comparable distance is ONE
float64 division of those exact integers (IEEE-correctly rounded, so
DuckDB's ``CAST(n AS DOUBLE)/CAST(l AS DOUBLE)`` reproduces it bit for
bit), and the per-point argmin tie-breaks on ``(d², road_id)`` —
deterministic even when two segments are equidistant.

Scale shape — the BROADCAST plan (road networks are the small side:
even a continent's segments fit one object-store put; the documented
seam past that bound is the knn_join cell-shuffle plan, same cover
keys):

- The driver scatters segments to the 1° cells their line passes
  through (``crossing_join._passage_cells`` — O(length) covers),
  DILATES each cover cell to its 3×3 neighbors and builds a sorted
  ``(cell_key → segment rows)`` index, ``ray.put`` ONCE.
- Points never shuffle: one ``map_batches`` pass looks up each
  point's OWN cell in the index (``searchsorted`` range), enumerates
  candidates with a vectorized ragged gather, evaluates the exact
  distance, filters to ``d² ≤ rmax²`` and keeps the per-point argmin
  in-block. With ``rmax`` ≤ the cell edge (8), the dilated cover
  guarantees every segment within ``rmax`` of a point is a candidate
  in that point's cell — the single-cell lookup loses nothing.
- Points with no segment within ``rmax`` are dropped (documented;
  LEFT-attach at the call site if unmatcheds must surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .crossing_join import _passage_cells

_KEY_PACK = np.int64(1) << 21
_KEY_OFF = np.int64(1) << 20


def _pack(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cx + _KEY_OFF) * _KEY_PACK + (cy + _KEY_OFF)


def build_segment_index(segments: pa.Table):
    """Dilated passage-cell index of a (road_id, x1, y1, x2, y2)
    segment table: returns dict of numpy arrays — sorted packed cell
    keys, the segment row each (cell, segment) entry points at, and
    the segment coordinate/ID columns."""
    x1 = np.asarray(segments["x1"], np.int64)
    y1 = np.asarray(segments["y1"], np.int64)
    x2 = np.asarray(segments["x2"], np.int64)
    y2 = np.asarray(segments["y2"], np.int64)
    rid = np.asarray(segments["road_id"], np.int64)
    zeros = np.zeros(len(x1), np.int64)
    rep, cx, cy = _passage_cells(x1, y1, x2, y2, zeros, zeros,
                                 np.int64(8), 0)
    # 3x3 dilation, deduped per (cell, segment)
    reps, cxs, cys = [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            reps.append(rep)
            cxs.append(cx + dx)
            cys.append(cy + dy)
    rep = np.concatenate(reps)
    key = _pack(np.concatenate(cxs), np.concatenate(cys))
    uniq = np.unique(np.stack([key, rep], axis=1), axis=0)
    key, rep = uniq[:, 0], uniq[:, 1]
    order = np.argsort(key, kind="stable")
    return {"keys": key[order], "seg": rep[order],
            "x1": x1, "y1": y1, "x2": x2, "y2": y2, "road_id": rid}


def _snap_kernel(px, py, pid, idx, rmax2: int):
    """Vectorized candidate enumeration + exact distance + per-point
    argmin with (d², road_id) tie-break. Returns (pid, road_id, snap_d2)
    numpy arrays for matched points."""
    key = _pack(px // 8, py // 8)
    lo = np.searchsorted(idx["keys"], key, side="left")
    hi = np.searchsorted(idx["keys"], key, side="right")
    cnt = hi - lo
    rep = np.repeat(np.arange(len(px)), cnt)
    loc = np.arange(int(cnt.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(cnt) - cnt, cnt)
    s = idx["seg"][lo[rep] + loc]
    ax, ay = idx["x1"][s], idx["y1"][s]
    bx, by = idx["x2"][s], idx["y2"][s]
    qx, qy = px[rep], py[rep]
    apx, apy = qx - ax, qy - ay
    bpx, bpy = qx - bx, qy - by
    abx, aby = bx - ax, by - ay
    dot = apx * abx + apy * aby
    len2 = abx * abx + aby * aby
    ap2 = apx * apx + apy * apy
    bp2 = bpx * bpx + bpy * bpy
    interior = (dot > 0) & (dot < len2)
    num = np.where(interior, ap2 * len2 - dot * dot,
                   np.where(dot <= 0, ap2, bp2))
    den = np.where(interior, len2, np.int64(1))
    with np.errstate(divide="ignore", invalid="ignore"):
        d2 = num.astype(np.float64) / den.astype(np.float64)
    # degenerate zero-length segment: den stays 1, num = ap2 (dot=len2=0
    # routes through the dot <= 0 branch)
    ok = d2 <= float(rmax2)
    rep, s, d2 = rep[ok], s[ok], d2[ok]
    if rep.size == 0:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.float64)
    road = idx["road_id"][s]
    order = np.lexsort((road, d2, rep))
    rep, road, d2 = rep[order], road[order], d2[order]
    first = np.r_[True, rep[1:] != rep[:-1]]
    return pid[rep[first]], road[first], d2[first]


def snap_to_segments(points_ds, segments: pa.Table, rmax: int = 8,
                     id_col: str = "event_id"):
    """``points_ds`` needs (id, x, y ×8-int); ``segments`` is a small
    (road_id, x1, y1, x2, y2) table (module docstring: broadcast side).
    → Dataset (id, road_id, snap_d2) for points with a segment within
    ``rmax`` (snap_d2 = exact-rational distance² as float64)."""
    import ray

    if rmax > 8:
        raise ValueError("rmax must be <= the 1-degree cell edge (8)")
    idx_ref = ray.put(build_segment_index(segments))
    rmax2 = int(rmax) * int(rmax)

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "road_id": pa.array([], pa.int64()),
                             "snap_d2": pa.array([], pa.float64())})
        idx = ray.get(idx_ref)
        pid, road, d2 = _snap_kernel(
            np.asarray(t["x"], np.int64), np.asarray(t["y"], np.int64),
            np.asarray(t[id_col], np.int64), idx, rmax2)
        return pa.table({id_col: pa.array(pid),
                         "road_id": pa.array(road),
                         "snap_d2": pa.array(d2)})

    return points_ds.map_batches(kernel, batch_format="pyarrow")
