"""Integer fixed-point PageRank — iterative graph propagation with a
bit-exact, engine-independent result.

All arithmetic is integer: ranks are held scaled by ``scale`` (node
init = ``scale``), each iteration computes

    r'(v) = (d_num·scale) ... precisely:
    r'(v) = base + (d_num · Σ_{u→v} (r(u) // out(u))) // d_den,
    base  = ((d_den - d_num) · scale) // d_den

with floor division at exactly two points (per-source share, damped
sum), so any engine — this one under any block layout / plan, or a SQL
replay — produces the same int64 ranks. Precondition (documented, not
checked per-row): ``num_nodes · scale · d_num < 2^63``.

Dangling nodes (out-degree 0) keep their share (no redistribution —
documented semantics); nodes with no in-links land on ``base`` via a
zero-contribution union rather than an outer join.

Two plans, mirroring ``stages/dedup.exact_dedup``'s row-bound switch:

* ``broadcast`` (node table fits a worker): ranks + out-degrees ship
  once per iteration via ``ray.put`` as dense arrays indexed by
  ``searchsorted`` on the sorted node ids; each block emits SPARSE
  per-destination partial sums which the driver merges (bounded by the
  same precondition that let the node table broadcast).
* ``shuffle`` (the 100-TB shape): out-degrees attach to the edge table
  ONCE before the loop; each iteration is one ``equi_join_shuffle`` of
  edges with the narrow rank table on src plus one ``groupby(dst).sum``
  of the integer shares — 2 narrow exchanges per iteration, nothing
  node-count-sized through the driver.

``plan="auto"`` counts nodes once and picks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _base(scale: int, d_num: int, d_den: int) -> int:
    return ((d_den - d_num) * scale) // d_den


def pagerank(edges, nodes, iters: int = 5, scale: int = 10**12,
             d_num: int = 85, d_den: int = 100,
             src_col: str = "src", dst_col: str = "dst",
             node_col: str = "node", plan: str = "auto",
             broadcast_rows: int = 2_000_000) -> pa.Table:
    """PageRank over ``edges`` (src, dst) for the node set ``nodes``
    (one int64 id per row) → pa.Table (node, rank), rank int64."""
    if plan == "auto":
        plan = ("broadcast" if nodes.count() <= broadcast_rows
                else "shuffle")
    if plan == "broadcast":
        return _pagerank_broadcast(edges, nodes, iters, scale, d_num,
                                   d_den, src_col, dst_col, node_col)
    return _pagerank_shuffle(edges, nodes, iters, scale, d_num, d_den,
                             src_col, dst_col, node_col)


def _pagerank_broadcast(edges, nodes, iters, scale, d_num, d_den,
                        src_col, dst_col, node_col) -> pa.Table:
    import ray

    node_ids = np.unique(np.asarray(
        nodes.to_pandas()[node_col], np.int64))
    n = len(node_ids)
    base = _base(scale, d_num, d_den)

    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "o": pa.array([], pa.int64())})
        s, c = np.unique(np.asarray(t[src_col], np.int64),
                         return_counts=True)
        return pa.table({"src": pa.array(s), "o": pa.array(c)})

    degp = edges.map_batches(deg_partial,
                             batch_format="pyarrow").to_pandas()
    degp = degp.groupby("src")["o"].sum()
    out_deg = np.zeros(n, np.int64)
    out_deg[np.searchsorted(node_ids, degp.index.to_numpy())] = \
        degp.to_numpy()

    ranks = np.full(n, scale, np.int64)
    for _ in range(iters):
        ref = ray.put((node_ids, ranks, out_deg))

        def contrib(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            ids, r, o = ray.get(ref)
            src = np.searchsorted(ids, np.asarray(t[src_col], np.int64))
            share = r[src] // o[src]
            d, inv = np.unique(np.asarray(t[dst_col], np.int64),
                               return_inverse=True)
            sums = np.zeros(len(d), np.int64)
            np.add.at(sums, inv, share)
            return pa.table({"dst": pa.array(d), "c": pa.array(sums)})

        parts = edges.map_batches(contrib,
                                  batch_format="pyarrow").to_pandas()
        merged = parts.groupby("dst")["c"].sum()
        s = np.zeros(n, np.int64)
        s[np.searchsorted(node_ids, merged.index.to_numpy())] = \
            merged.to_numpy()
        ranks = base + (d_num * s) // d_den
    return pa.table({node_col: pa.array(node_ids),
                     "rank": pa.array(ranks)})


def _pagerank_shuffle(edges, nodes, iters, scale, d_num, d_den,
                      src_col, dst_col, node_col) -> pa.Table:
    import ray.data

    from ..joins.equi_join import equi_join_shuffle

    base = _base(scale, d_num, d_den)
    deg = edges.groupby(src_col).count() \
        .map_batches(lambda t: pa.table({
            src_col: pc_cast_i64(t[src_col]),
            "o": pc_cast_i64(t["count()"])}), batch_format="pyarrow")
    # out-degree rides the edge table once, outside the loop
    edges_deg = equi_join_shuffle(edges, deg, on=src_col).materialize()

    zeros = nodes.map_batches(
        lambda t: pa.table({dst_col: pc_cast_i64(t[node_col]),
                            "c": pa.array(np.zeros(t.num_rows,
                                                   np.int64))}),
        batch_format="pyarrow")

    ranks = nodes.map_batches(
        lambda t: pa.table({src_col: pc_cast_i64(t[node_col]),
                            "r": pa.array(np.full(t.num_rows, scale,
                                                  np.int64))}),
        batch_format="pyarrow")

    for _ in range(iters):
        joined = equi_join_shuffle(edges_deg, ranks, on=src_col)

        def share(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({dst_col: pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({
                dst_col: t[dst_col],
                "c": pa.array(np.asarray(t["r"], np.int64)
                              // np.asarray(t["o"], np.int64))})

        summed = (joined.map_batches(share, batch_format="pyarrow")
                  .union(zeros).groupby(dst_col).sum("c"))

        def damp(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({src_col: pa.array([], pa.int64()),
                                 "r": pa.array([], pa.int64())})
            s = np.asarray(t["sum(c)"], np.int64)
            return pa.table({src_col: pc_cast_i64(t[dst_col]),
                             "r": pa.array(base + (d_num * s) // d_den)})

        ranks = summed.map_batches(damp,
                                   batch_format="pyarrow").materialize()

    out = ranks.to_pandas().rename(
        columns={src_col: node_col, "r": "rank"})
    out = out.sort_values(node_col).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def pc_cast_i64(arr) -> pa.Array:
    import pyarrow.compute as pc
    return pc.cast(arr, pa.int64())


def pagerank_brute(edges_df: pd.DataFrame, node_ids: np.ndarray,
                   iters: int = 5, scale: int = 10**12,
                   d_num: int = 85, d_den: int = 100) -> np.ndarray:
    """Sequential spec replay (tests): same two floor divisions."""
    node_ids = np.sort(np.asarray(node_ids, np.int64))
    n = len(node_ids)
    src = np.searchsorted(node_ids, edges_df["src"].to_numpy(np.int64))
    dst = np.searchsorted(node_ids, edges_df["dst"].to_numpy(np.int64))
    out_deg = np.zeros(n, np.int64)
    np.add.at(out_deg, src, 1)
    ranks = np.full(n, scale, np.int64)
    base = _base(scale, d_num, d_den)
    for _ in range(iters):
        share = ranks[src] // out_deg[src]
        s = np.zeros(n, np.int64)
        np.add.at(s, dst, share)
        ranks = base + (d_num * s) // d_den
    return ranks
