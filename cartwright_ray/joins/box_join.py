"""Box-overlap join (2-D interval join): pairs of axis-aligned boxes
whose areas intersect — the rectangle/bbox-intersection primitive under
polygon-polygon joins (filter step of the standard filter+refine spatial
join; the engine's PIP/zonal machinery is the refine step for exact
geometry). The reference has no spatial joins at all; this extends the
engine's join family (north_rule "spatial-join engine").

Two physical plans, same contract as the point-join family:

* ``box_join`` (broadcast): the small side's four edge arrays ship once
  via ``ray.put``; each large-side batch does ONE vectorized
  numpy-broadcast overlap test (O(|batch| x |small|) comparisons, no
  Python loop).
* ``box_join_shuffle`` (both sides large): each box is keyed to every
  graticule cell its extent overlaps (bounded replication: ceil(w/cell)
  x ceil(h/cell) keys per box), ONE sort exchange co-locates cells, a
  whole-block segment kernel tests pairs per cell, and duplicate pairs
  across cells are eliminated WITHOUT a second shuffle by the
  REFERENCE-POINT rule: a pair is emitted only by the cell containing
  the southwest corner of the intersection (which exists iff the boxes
  overlap, and lies in exactly one cell both boxes touch).

Boxes are (id, lat0, lat1, lon0, lon1) with lat0<=lat1, lon0<=lon1 (no
antimeridian wrap — split wrapped boxes before joining, same contract
as ``sources/spatial_store.bbox_cover_prefixes``). Edges touching
counts as overlap (closed intervals), matching the SQL predicate
``a.lat0 <= b.lat1 AND a.lat1 >= b.lat0 AND ...``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PAIRS = pa.schema([("a_id", pa.string()), ("b_id", pa.string())])


def _pairs_table(a_ids: np.ndarray, b_ids: np.ndarray) -> pa.Table:
    return pa.table({"a_id": pa.array(a_ids, pa.string()),
                     "b_id": pa.array(b_ids, pa.string())})


def box_join(a_ds, b: dict):
    """Broadcast plan: ``b`` is a dict of numpy-able columns
    (box_id, lat0, lat1, lon0, lon1). Returns (a_id, b_id) pairs."""
    import ray

    b_ref = ray.put({k: np.asarray(v) for k, v in b.items()})

    def probe(t: pa.Table) -> pa.Table:
        bb = ray.get(b_ref)
        ala0 = np.asarray(t["lat0"], dtype=np.float64)[:, None]
        ala1 = np.asarray(t["lat1"], dtype=np.float64)[:, None]
        alo0 = np.asarray(t["lon0"], dtype=np.float64)[:, None]
        alo1 = np.asarray(t["lon1"], dtype=np.float64)[:, None]
        m = ((ala0 <= bb["lat1"][None, :]) & (ala1 >= bb["lat0"][None, :])
             & (alo0 <= bb["lon1"][None, :]) & (alo1 >= bb["lon0"][None, :]))
        ai, bi = np.nonzero(m)
        a_ids = np.asarray(t["box_id"], dtype=object)[ai]
        return _pairs_table(a_ids.astype(str), bb["box_id"][bi].astype(str))

    return a_ds.map_batches(probe, batch_format="pyarrow")


def box_join_shuffle(a_ds, b_ds, cell_deg: float = 8.0):
    """Shuffle plan for two large box tables (see module docstring)."""

    n_cols = max(1, int(round(360.0 / cell_deg)))

    def key_side(side: int):
        def key(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["box_id"], dtype=object)
            la0 = np.asarray(t["lat0"], dtype=np.float64)
            la1 = np.asarray(t["lat1"], dtype=np.float64)
            lo0 = np.asarray(t["lon0"], dtype=np.float64)
            lo1 = np.asarray(t["lon1"], dtype=np.float64)
            # fully vectorized replication: per-box cell-rectangle
            # extents, then flat local offsets decode to (dr, dc)
            # upper-edge clamp on BOTH ends (a degenerate box starting
            # exactly at lat 90 / lon 180 must still get one cell), and
            # the reference-point below clamps identically
            r0 = np.floor((np.minimum(la0, 90.0 - 1e-12) + 90.0)
                          / cell_deg).astype(np.int64)
            r1 = np.floor((np.minimum(la1, 90.0 - 1e-12) + 90.0)
                          / cell_deg).astype(np.int64)
            c0 = np.floor((np.minimum(lo0, 180.0 - 1e-12) + 180.0)
                          / cell_deg).astype(np.int64)
            c1 = np.floor((np.minimum(lo1, 180.0 - 1e-12) + 180.0)
                          / cell_deg).astype(np.int64)
            nr, nc = r1 - r0 + 1, c1 - c0 + 1
            cnt = nr * nc
            i = np.repeat(np.arange(len(ids)), cnt)
            off = np.arange(int(cnt.sum())) \
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            nc_rep = np.repeat(nc, cnt)
            k = (r0[i] + off // nc_rep) * n_cols + (c0[i] + off % nc_rep)
            return pa.table({
                "bj_key": pa.array(k, pa.int64()),
                "bj_side": pa.array(np.full(len(k), side, np.int8)),
                "box_id": pa.array(ids[i].astype(str), pa.string()),
                "lat0": pa.array(la0[i]), "lat1": pa.array(la1[i]),
                "lon0": pa.array(lo0[i]), "lon1": pa.array(lo1[i])})
        return key

    def cells_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIRS.empty_table()
        key = np.asarray(t["bj_key"])
        side = np.asarray(t["bj_side"])
        ids = np.asarray(t["box_id"], dtype=object)
        la0 = np.asarray(t["lat0"], dtype=np.float64)
        la1 = np.asarray(t["lat1"], dtype=np.float64)
        lo0 = np.asarray(t["lon0"], dtype=np.float64)
        lo1 = np.asarray(t["lon1"], dtype=np.float64)
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(key)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            am = side[s:e] == 0
            bm = ~am
            if not am.any() or not bm.any():
                continue
            sl = slice(s, e)
            A = {c: v[sl][am] for c, v in
                 (("id", ids), ("la0", la0), ("la1", la1),
                  ("lo0", lo0), ("lo1", lo1))}
            B = {c: v[sl][bm] for c, v in
                 (("id", ids), ("la0", la0), ("la1", la1),
                  ("lo0", lo0), ("lo1", lo1))}
            m = ((A["la0"][:, None] <= B["la1"][None, :])
                 & (A["la1"][:, None] >= B["la0"][None, :])
                 & (A["lo0"][:, None] <= B["lo1"][None, :])
                 & (A["lo1"][:, None] >= B["lo0"][None, :]))
            # reference-point dedup: emit only where THIS cell contains
            # the intersection's SW corner
            rlat = np.minimum(np.maximum(A["la0"][:, None],
                                         B["la0"][None, :]), 90.0 - 1e-12)
            rlon = np.minimum(np.maximum(A["lo0"][:, None],
                                         B["lo0"][None, :]), 180.0 - 1e-12)
            rkey = (np.floor((rlat + 90.0) / cell_deg).astype(np.int64)
                    * n_cols
                    + np.floor((rlon + 180.0) / cell_deg).astype(np.int64))
            m &= rkey == key[s]
            ai, bi = np.nonzero(m)
            if ai.size:
                out_a.append(A["id"][ai])
                out_b.append(B["id"][bi])
        if not out_a:
            return _PAIRS.empty_table()
        return _pairs_table(np.concatenate(out_a).astype(str),
                            np.concatenate(out_b).astype(str))

    both = (a_ds.map_batches(key_side(0), batch_format="pyarrow")
            .union(b_ds.map_batches(key_side(1), batch_format="pyarrow")))
    return (both.sort("bj_key")
            .map_batches(cells_block, batch_format="pyarrow",
                         batch_size=None))


def brute_force_box_join(a: dict, b: dict):
    """O(n*m) oracle: sorted (a_id, b_id) overlap pairs."""
    out = []
    for i in range(len(a["box_id"])):
        for j in range(len(b["box_id"])):
            if (a["lat0"][i] <= b["lat1"][j] and a["lat1"][i] >= b["lat0"][j]
                    and a["lon0"][i] <= b["lon1"][j]
                    and a["lon1"][i] >= b["lon0"][j]):
                out.append((str(a["box_id"][i]), str(b["box_id"][j])))
    return sorted(out)
