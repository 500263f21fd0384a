"""Inverse-distance-weighted (IDW) spatial interpolation — the classic
geostatistics surface estimator (Shepard 1968): the value at a query
location is the 1/d²-weighted mean of its k nearest observation
points.

Metric: SQUARED DEGREE distance ``d² = (Δlat)² + (Δlon)²`` — a pure
rational expression whose products and sums are IEEE exactly-rounded,
so the k-nearest SELECTION is bit-identical in any engine (the DuckDB
oracle replays it with ``row_number() OVER (ORDER BY d2, id)``), and
the 1/d² weights are rational too. A production deployment over wide
extents would swap in :mod:`..geo.haversine` (the kernel exists and is
oracle-checked elsewhere); trig-based metrics make cross-engine
neighbor selection 1-ulp fragile, which matters more here than great-
circle fidelity at grid-local scales.

Scale shape (the k-means-seeding pattern): the query table is a small
broadcast constant; each block computes a vectorized n_q × n_block
distance matrix and keeps its LOCAL k nearest per query
(``np.argpartition``), so only ``k × n_q × num_blocks`` narrow partial
rows ever leave the map — the observation corpus itself never
shuffles. The driver merges partials and computes the weighted means.

Exact-hit rule: if any of the k nearest sits at d² == 0, the estimate
is the plain mean of the coincident observations (the 1/d² weight
would be infinite — standard Shepard handling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def idw_interpolate(ds, queries, k: int = 8,
                    lat_col: str = "lat", lon_col: str = "lon",
                    val_col: str = "value", id_cols=("doc_id",)):
    """``queries``: list of ``(query_id, qlat, qlon)`` tuples (small,
    broadcast by closure). → pandas-ready Arrow table
    ``(query_id, n_neighbors, idw_value)`` with ``idw_value`` floored
    at 1e-6; ties in the k-th neighbor broken by ``id_cols``
    (ascending), matching the oracle's ``ORDER BY d2, ids``."""
    import ray
    import ray.data

    qid = np.array([q[0] for q in queries], np.int64)
    qlat = np.array([q[1] for q in queries], np.float64)
    qlon = np.array([q[2] for q in queries], np.float64)
    n_q = len(qid)
    id_cols = list(id_cols)

    def block_partials(t: pa.Table) -> pa.Table:
        lat = np.asarray(pc.cast(t[lat_col], pa.float64()))
        lon = np.asarray(pc.cast(t[lon_col], pa.float64()))
        val = np.asarray(pc.cast(t[val_col], pa.float64()))
        # n_q × n squared-degree distances — two rank-1 broadcasts
        dlat = lat[None, :] - qlat[:, None]
        dlon = lon[None, :] - qlon[:, None]
        d2 = dlat * dlat + dlon * dlon
        kk = min(k, d2.shape[1])
        # block-local k smallest per query, ties resolved at the merge
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk] \
            if kk < d2.shape[1] else \
            np.broadcast_to(np.arange(d2.shape[1]), (n_q, d2.shape[1]))
        rows_q = np.repeat(np.arange(n_q), part.shape[1])
        rows_p = part.reshape(-1)
        out = {"query_id": pa.array(qid[rows_q], pa.int64()),
               "d2": pa.array(d2[rows_q, rows_p], pa.float64()),
               "val": pa.array(val[rows_p], pa.float64())}
        for c in id_cols:
            out[c] = t[c].take(pa.array(rows_p, pa.int64()))
        return pa.table(out)

    refs = (ds.map_batches(block_partials, batch_format="pyarrow",
                           zero_copy_batch=True)
              .materialize().to_arrow_refs())  # ≤ k × n_q × blocks rows
    parts = pa.concat_tables([t.combine_chunks()
                              for t in ray.get(refs)])
    # deterministic global k per query: (query, d2, ids) lexicographic
    # np.lexsort: LAST key is primary → (query, d2, id_cols...) order
    keys = [np.asarray(parts["d2"]), np.asarray(parts["query_id"])]
    for c in id_cols:
        col = parts[c]
        if pa.types.is_string(col.type) or \
                pa.types.is_large_string(col.type):
            keys.insert(0, np.asarray(pc.cast(col, pa.int64())))
        else:
            keys.insert(0, np.asarray(col))
    order = np.lexsort(tuple(keys))
    q = np.asarray(parts["query_id"])[order]
    d2 = np.asarray(parts["d2"])[order]
    val = np.asarray(parts["val"])[order]
    # rank within query group, take first k
    grp_start = np.r_[True, q[1:] != q[:-1]]
    idx = np.arange(len(q))
    rank = idx - np.maximum.accumulate(np.where(grp_start, idx, 0))
    m = rank < k
    q, d2, val = q[m], d2[m], val[m]
    out_rows = []
    for g in np.unique(q):
        sel = q == g
        dd, vv = d2[sel], val[sel]
        if (dd == 0).any():
            est = vv[dd == 0].mean()
        else:
            w = 1.0 / dd
            est = float((w * vv).sum() / w.sum())
        out_rows.append((int(g), int(sel.sum()),
                         np.floor(est * 1e6) / 1e6))
    out_rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in out_rows], pa.int64()),
        "n_neighbors": pa.array([r[1] for r in out_rows], pa.int64()),
        "idw_value": pa.array([r[2] for r in out_rows], pa.float64())})
