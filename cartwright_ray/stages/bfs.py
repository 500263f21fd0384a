"""Multi-source BFS hop distances — iterative frontier expansion with a
bit-exact, engine-independent result (the fourth member of the graph
family: PageRank, connected components, triangles).

Semantics: exactly ``iters`` relaxation rounds of

    d_{t+1}(v) = min(d_t(v), 1 + min_{(u,v) in E} d_t(u))

starting from d_0 = 0 on the seed set, so the output is the set of
nodes within ``iters`` hops of any seed with their exact hop count.
All values are small int64s under ``min`` — any engine (this one under
any block layout / plan, or an unrolled SQL replay joining the FULL
d_t table each round) produces identical rows.

The engine relaxes only the FRONTIER (nodes first labeled in round t)
rather than all of d_t: a node labeled earlier already relaxed its
edges in an earlier round, and ``min`` is idempotent, so the result is
provably identical while each round's join carries only the new rows —
at web scale the frontier is the working set, not the reached set.

Two plans, mirroring ``stages/pagerank.pagerank``'s row-bound switch:

* ``broadcast`` (reached set fits a worker): the frontier ships once
  per round via ``ray.put`` as a sorted id array; each edge block
  emits per-block-distinct new destinations, deduped by a narrow
  groupby; the driver folds them into the reached dict (bounded by the
  same precondition that lets the set broadcast).
* ``shuffle`` (the 100-TB shape): each round is one
  ``equi_join_shuffle`` of the edge table with the narrow frontier on
  src plus a ``groupby(dst).min`` — two narrow exchanges per round,
  nothing node-count-sized through the driver. The union with the
  accumulated dist table is a groupby-min, so duplicate discoveries
  collapse without an anti-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bfs_hops(edges, seeds, iters: int = 4,
             src_col: str = "src", dst_col: str = "dst",
             node_col: str = "node", plan: str = "auto",
             broadcast_rows: int = 2_000_000) -> pa.Table:
    """``edges``: directed (src, dst) Dataset (emit both directions for
    an undirected graph); ``seeds``: Dataset with one int64 ``node_col``
    id per row. → pa.Table (node, dist) for every node reached within
    ``iters`` hops, sorted by node."""
    if plan == "auto":
        # the reached set is bounded by the node count; seeds.count()
        # alone can't bound it, so the caller passes plan="shuffle" when
        # the GRAPH is huge — auto only downgrades when seeds are huge.
        plan = ("broadcast" if seeds.count() <= broadcast_rows
                else "shuffle")
    if plan == "broadcast":
        return _bfs_broadcast(edges, seeds, iters, src_col, dst_col,
                              node_col)
    return _bfs_shuffle(edges, seeds, iters, src_col, dst_col, node_col)


def _seed_ids(seeds, node_col: str) -> np.ndarray:
    parts = [np.asarray(t[node_col], np.int64)
             for t in seeds.select_columns([node_col])
             .iter_batches(batch_format="pyarrow", batch_size=None)
             if t.num_rows]
    if not parts:
        return np.array([], np.int64)
    return np.unique(np.concatenate(parts))


def _bfs_broadcast(edges, seeds, iters, src_col, dst_col, node_col):
    import ray
    from ray.data.aggregate import Min

    from .partition import drop_empty_blocks

    reached = {}                      # node -> dist (driver-bounded)
    frontier = _seed_ids(seeds, node_col)
    for n in frontier:
        reached[int(n)] = 0

    for t in range(iters):
        if len(frontier) == 0:
            break
        f_ref = ray.put(np.sort(frontier))

        def expand(tb: pa.Table, _f=f_ref, _d=t + 1) -> pa.Table:
            f = ray.get(_f)
            src = np.asarray(tb[src_col], np.int64)
            pos = np.searchsorted(f, src)
            pos[pos >= len(f)] = 0
            hit = f[pos] == src
            dst = np.unique(np.asarray(tb[dst_col], np.int64)[hit])
            return pa.table({"n": pa.array(dst),
                             "d": pa.array(np.full(len(dst), _d,
                                                   np.int64))})

        cand = drop_empty_blocks(
            edges.map_batches(expand, batch_format="pyarrow"))
        if cand is None:
            frontier = np.array([], np.int64)
            continue
        new = (cand.groupby("n").aggregate(Min("d", alias_name="d"))
               .to_pandas())
        fresh = [int(v) for v in new["n"] if int(v) not in reached]
        for v in fresh:
            reached[v] = t + 1
        frontier = np.array(fresh, np.int64)

    ks = sorted(reached)
    return pa.table({node_col: pa.array(ks, pa.int64()),
                     "dist": pa.array([reached[k] for k in ks],
                                      pa.int64())})


def _bfs_shuffle(edges, seeds, iters, src_col, dst_col, node_col):
    import ray.data
    from ray.data.aggregate import Min

    from ..joins.equi_join import equi_join_shuffle
    from .partition import drop_empty_blocks

    def as_frontier(t: pa.Table, dist: int) -> pa.Table:
        return pa.table({src_col: t.column(0).cast(pa.int64()),
                         "dist": pa.array(
                             np.full(t.num_rows, dist, np.int64))})

    seed_tbl = pa.table({src_col: pa.array(_seed_ids(seeds, node_col))})
    dist_ds = ray.data.from_arrow(as_frontier(seed_tbl, 0))
    frontier = dist_ds
    for t in range(iters):
        hits = equi_join_shuffle(
            edges.select_columns([src_col, dst_col]), frontier,
            on=src_col)
        cand = hits.map_batches(
            lambda tb, _d=t + 1: pa.table(
                {src_col: tb[dst_col].cast(pa.int64()),
                 "dist": pa.array(np.full(tb.num_rows, _d, np.int64))}),
            batch_format="pyarrow")
        dist_ds = (dist_ds.union(cand).groupby(src_col)
                   .aggregate(Min("dist", alias_name="dist"))
                   .materialize())
        clean = drop_empty_blocks(dist_ds.filter(expr=f"dist == {t + 1}"))
        if clean is None:
            break
        frontier = clean

    out = dist_ds.sort(src_col).to_pandas()
    return pa.table({node_col: pa.array(out[src_col].to_numpy(np.int64)),
                     "dist": pa.array(out["dist"].to_numpy(np.int64))})


_SSSP_BIG = np.int64(1) << 60          # +inf sentinel for old-dist min


def sssp_bounded(edges, seeds, iters: int = 4,
                 src_col: str = "src", dst_col: str = "dst",
                 w_col: str = "w", node_col: str = "node",
                 plan: str = "auto",
                 broadcast_rows: int = 2_000_000) -> pa.Table:
    """Bounded Bellman-Ford — single/multi-source shortest paths with
    INTEGER edge weights, exactly ``iters`` min-plus relaxation rounds:

        d_{t+1}(v) = min(d_t(v), min_{(u,v,w)} d_t(u) + w)

    The weighted sibling of :func:`bfs_hops` (distances can IMPROVE in
    later rounds, so the frontier is the CHANGED set each round — a
    node whose dist didn't change relaxed the same edges to the same
    values before, so skipping it is provably lossless, the classic
    Bellman-Ford queue optimization). All dists are int64 under min —
    bit-exact against the unrolled full-table SQL replay.

    Plans mirror bfs_hops: ``broadcast`` ships the changed (id, dist)
    arrays per round via ``ray.put``; ``shuffle`` joins the edge table
    with the narrow changed-row table (``equi_join_shuffle``) and
    folds via a tagged two-Min groupby (min over all candidates vs min
    over previous rows) so changed detection needs no anti-join.

    → pa.Table (node, dist) for nodes within ``iters`` relaxations."""
    if plan == "auto":
        plan = ("broadcast" if seeds.count() <= broadcast_rows
                else "shuffle")
    if plan == "broadcast":
        return _sssp_broadcast(edges, seeds, iters, src_col, dst_col,
                               w_col, node_col)
    return _sssp_shuffle(edges, seeds, iters, src_col, dst_col, w_col,
                         node_col)


def _sssp_broadcast(edges, seeds, iters, src_col, dst_col, w_col,
                    node_col):
    import ray
    from ray.data.aggregate import Min

    from .partition import drop_empty_blocks

    dist = {}
    front_ids = _seed_ids(seeds, node_col)
    front_d = np.zeros(len(front_ids), np.int64)
    for n in front_ids:
        dist[int(n)] = 0

    for _ in range(iters):
        if len(front_ids) == 0:
            break
        order = np.argsort(front_ids)
        f_ref = ray.put((front_ids[order], front_d[order]))

        def relax(tb: pa.Table, _f=f_ref) -> pa.Table:
            fid, fd = ray.get(_f)
            src = np.asarray(tb[src_col], np.int64)
            pos = np.searchsorted(fid, src)
            pos[pos >= len(fid)] = 0
            hit = fid[pos] == src
            dst = np.asarray(tb[dst_col], np.int64)[hit]
            cand = fd[pos[hit]] + np.asarray(tb[w_col], np.int64)[hit]
            if not len(dst):
                return pa.table({"n": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            df = pd.DataFrame({"n": dst, "d": cand})
            g = df.groupby("n", sort=False).min().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        cand = drop_empty_blocks(
            edges.map_batches(relax, batch_format="pyarrow"))
        if cand is None:
            break
        new = (cand.groupby("n").aggregate(Min("d", alias_name="d"))
               .to_pandas())
        ids, ds = [], []
        for v, d in zip(new["n"].to_numpy(np.int64),
                        new["d"].to_numpy(np.int64)):
            if dist.get(int(v), int(_SSSP_BIG)) > d:
                dist[int(v)] = int(d)
                ids.append(int(v))
                ds.append(int(d))
        front_ids = np.array(ids, np.int64)
        front_d = np.array(ds, np.int64)

    ks = sorted(dist)
    return pa.table({node_col: pa.array(ks, pa.int64()),
                     "dist": pa.array([dist[k] for k in ks],
                                      pa.int64())})


def _sssp_shuffle(edges, seeds, iters, src_col, dst_col, w_col,
                  node_col):
    import ray.data
    from ray.data.aggregate import Min

    from ..joins.equi_join import equi_join_shuffle
    from .partition import drop_empty_blocks

    seed_ids = _seed_ids(seeds, node_col)
    dist_ds = ray.data.from_arrow(pa.table({
        src_col: pa.array(seed_ids),
        "dist": pa.array(np.zeros(len(seed_ids), np.int64))}))
    frontier = dist_ds

    for _ in range(iters):
        hits = equi_join_shuffle(
            edges.select_columns([src_col, dst_col, w_col]), frontier,
            on=src_col)
        cand = hits.map_batches(
            lambda tb: pa.table({
                src_col: tb[dst_col].cast(pa.int64()),
                "dist": pa.array(
                    np.asarray(tb["dist"], np.int64)
                    + np.asarray(tb[w_col], np.int64)),
                # old-dist channel: +inf (candidates are never "old")
                "old": pa.array(np.full(tb.num_rows, int(_SSSP_BIG),
                                        np.int64))}),
            batch_format="pyarrow")
        tagged_old = dist_ds.map_batches(
            lambda tb: tb.append_column(
                "old", tb["dist"].combine_chunks()),
            batch_format="pyarrow")
        merged = (tagged_old.union(cand).groupby(src_col)
                  .aggregate(Min("dist", alias_name="dist"),
                             Min("old", alias_name="old"))
                  .materialize())
        dist_ds = merged.select_columns([src_col, "dist"])
        changed = drop_empty_blocks(
            merged.filter(expr="dist < old")
            .select_columns([src_col, "dist"]))
        if changed is None:
            break
        frontier = changed

    out = dist_ds.sort(src_col).to_pandas()
    return pa.table({node_col: pa.array(out[src_col].to_numpy(np.int64)),
                     "dist": pa.array(out["dist"].to_numpy(np.int64))})
