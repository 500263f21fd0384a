"""k-core peeling — iterative degree-threshold subgraph extraction
(Seidman 1983; the distributed formulation follows the synchronous
peeling used in Pregel-style systems: each round drops EVERY node whose
current degree is below k, simultaneously).

Semantics: exactly ``rounds`` synchronous peel rounds over the
canonical undirected edge set —

    G_0 = dedup(edges);  G_{t+1} = G_t restricted to nodes with
    deg_{G_t}(v) >= k

— and the output is (node, deg) over G_rounds. Peeling is monotone
(once the k-core is reached, further rounds are no-ops), so for any
graph that converges within ``rounds`` this IS the k-core; either way
the result is a pure integer fixed-rule value that any engine — this
one under any block layout, or an unrolled SQL replay — reproduces
bit-exactly.

Scale shape per round: one endpoint-scatter ``groupby(node).count()``
(narrow, 2 rows per edge) for degrees, then the edge filter. Two plans
for the filter, mirroring ``stages/pagerank``'s row-bound switch:

* ``broadcast``: only the DELTA — nodes removed THIS round — ships via
  ``ray.put`` as a sorted id array, and edges drop by a vectorized
  membership test. Peel deltas shrink monotonically; the bound is the
  first round's removal count, which the caller bounds by k-choice.
* ``shuffle`` (the 100-TB shape): the surviving-node table semi-joins
  the edge table twice (on a, then b) via ``equi_join_shuffle`` —
  narrow exchanges only, nothing node-count-sized through the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _degrees(edges, a_col: str, b_col: str):
    """groupby-count over the endpoint scatter → Dataset (node, deg)."""
    def scatter(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col], np.int64)
        b = np.asarray(t[b_col], np.int64)
        return pa.table({"node": pa.array(np.concatenate([a, b]))})

    return (edges.map_batches(scatter, batch_format="pyarrow")
            .groupby("node").count()
            .map_batches(lambda t: pa.table({
                "node": t["node"].cast(pa.int64()),
                "deg": t["count()"].cast(pa.int64())}),
                batch_format="pyarrow"))


def kcore(edges, k: int = 5, rounds: int = 4,
          a_col: str = "a", b_col: str = "b", plan: str = "auto",
          broadcast_rows: int = 2_000_000) -> pa.Table:
    """``edges``: undirected canonical (a < b) edge Dataset, duplicates
    allowed (deduped here). → pa.Table (node, deg) for the nodes
    surviving ``rounds`` synchronous peels at threshold ``k``, with
    their degrees in the surviving subgraph, sorted by node."""
    from ray.data.aggregate import Sum

    from .partition import drop_empty_blocks

    cur = (edges.groupby([a_col, b_col])
           .aggregate(Sum(a_col, alias_name="_s"))
           .select_columns([a_col, b_col]).materialize())
    if plan == "auto":
        plan = ("broadcast" if cur.count() * 2 <= broadcast_rows
                else "shuffle")

    for _ in range(rounds):
        clean = drop_empty_blocks(cur)
        if clean is None:
            break
        cur = clean
        deg = _degrees(cur, a_col, b_col)
        if plan == "broadcast":
            cur = _drop_bad_broadcast(cur, deg, k, a_col, b_col)
        else:
            cur = _keep_good_shuffle(cur, deg, k, a_col, b_col)
        cur = cur.materialize()

    clean = drop_empty_blocks(cur)
    if clean is None:
        return pa.table({"node": pa.array([], pa.int64()),
                         "deg": pa.array([], pa.int64())})
    out = _degrees(clean, a_col, b_col).sort("node").to_pandas()
    return pa.table({"node": pa.array(out["node"].to_numpy(np.int64)),
                     "deg": pa.array(out["deg"].to_numpy(np.int64))})


def _drop_bad_broadcast(cur, deg, k, a_col, b_col):
    import ray

    bad_parts = [np.asarray(t["node"], np.int64)
                 for t in deg.filter(expr=f"deg < {k}")
                 .iter_batches(batch_format="pyarrow", batch_size=None)
                 if t.num_rows]
    if not bad_parts:
        return cur
    bad_ref = ray.put(np.sort(np.concatenate(bad_parts)))

    def drop(t: pa.Table, _b=bad_ref) -> pa.Table:
        bad = ray.get(_b)
        a = np.asarray(t[a_col], np.int64)
        b = np.asarray(t[b_col], np.int64)

        def member(x):
            pos = np.searchsorted(bad, x)
            pos[pos >= len(bad)] = 0
            return bad[pos] == x

        return t.filter(pa.array(~(member(a) | member(b))))

    return cur.map_batches(drop, batch_format="pyarrow")


def _keep_good_shuffle(cur, deg, k, a_col, b_col):
    from ..joins.equi_join import equi_join_shuffle
    from .partition import drop_empty_blocks

    good = drop_empty_blocks(deg.filter(expr=f"deg >= {k}"))
    if good is None:
        return cur.limit(0)
    good_a = good.map_batches(
        lambda t: pa.table({a_col: t["node"]}), batch_format="pyarrow")
    good_b = good.map_batches(
        lambda t: pa.table({b_col: t["node"]}), batch_format="pyarrow")
    kept = equi_join_shuffle(cur, good_a, on=a_col)
    kept = equi_join_shuffle(kept, good_b, on=b_col)
    return kept.select_columns([a_col, b_col])
