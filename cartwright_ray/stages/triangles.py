"""Triangle counting — the node-iterator / wedge-closure algorithm
(Schank & Wagner 2005) over a canonical undirected edge list, the third
classic of the engine's graph family (PageRank, connected components).

Each triangle {x<y<z} is counted exactly once: the WEDGE is generated
at its lowest vertex x (the two higher neighbors y<z), and closed iff
(y,z) is itself an edge. The closure test is a keyed aggregation, not a
lookup structure: wedges (tagged ``w=1``) and edges (tagged ``e=1``)
union into ONE groupby on the (y,z) key, and the per-key triangle
contribution is ``n_wedges · n_edges`` (n_edges ∈ {0,1} after dedup).

Scale shape: canonical dedup is a (a,b)-keyed groupby; wedge
generation is a hash exchange on the low vertex + the m² integer
decode per group (cost Σ deg²_low — id-orientation here since the
synthetic graph is near-regular; degree-ordering is the standard skew
fix for power-law graphs and slots into the same kernel); the closure
groupby carries one narrow row per wedge. The final reduce is a
per-block partial sum. Integers end to end — the DuckDB replay
(DISTINCT least/greatest edges + two joins) is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def triangle_count(edges_ds, a_col: str = "a", b_col: str = "b"):
    """``edges_ds``: canonical undirected edges (a < b, may contain
    duplicates — deduped here). → (n_edges, n_wedges, n_triangles)."""
    from ray.data.aggregate import Sum

    from .partition import drop_empty_blocks, hash_partitioned

    dedup = (edges_ds.groupby([a_col, b_col])
             .aggregate(Sum(a_col, alias_name="_s")))
    parted = hash_partitioned(dedup.select_columns([a_col, b_col]),
                              [a_col], rows_per_partition=25_000)
    if parted is None:
        import pandas as pd
        return pd.DataFrame([(0, 0, 0)],
                            columns=["n_edges", "n_wedges",
                                     "n_triangles"])

    def wedge_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "e": pa.array([], pa.int64())})
        a = np.asarray(t[a_col], np.int64)
        b = np.asarray(t[b_col], np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.r_[True, a[1:] != a[:-1]]
        starts = np.flatnonzero(new)
        m = np.r_[starts[1:], len(a)] - starts
        n2 = m * m
        rep = np.repeat(np.arange(len(m)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        i = starts[rep] + tloc // m[rep]
        j = starts[rep] + tloc % m[rep]
        keep = b[i] < b[j]                      # wedge (y, z), y < z
        wedges = pa.table({"x": pa.array(b[i][keep]),
                           "y": pa.array(b[j][keep]),
                           "w": pa.array(np.ones(int(keep.sum()),
                                                 np.int64)),
                           "e": pa.array(np.zeros(int(keep.sum()),
                                                  np.int64))})
        own = pa.table({"x": pa.array(a), "y": pa.array(b),
                        "w": pa.array(np.zeros(len(a), np.int64)),
                        "e": pa.array(np.ones(len(a), np.int64))})
        return pa.concat_tables([wedges, own])

    tagged = parted.map_batches(wedge_kernel, batch_format="pyarrow",
                                batch_size=None)
    clean = drop_empty_blocks(tagged)
    closed = (clean.groupby(["x", "y"])
              .aggregate(Sum("w", alias_name="w"),
                         Sum("e", alias_name="e")))

    parts = closed.map_batches(
        lambda t: pa.table({
            "tri": [int((np.asarray(t["w"], np.int64)
                         * np.asarray(t["e"], np.int64)).sum())],
            "wedges": [int(np.asarray(t["w"], np.int64).sum())],
            "edges": [int(np.asarray(t["e"], np.int64).sum())]}),
        batch_format="pyarrow").to_pandas()

    import pandas as pd
    return pd.DataFrame([(int(parts["edges"].sum()),
                          int(parts["wedges"].sum()),
                          int(parts["tri"].sum()))],
                        columns=["n_edges", "n_wedges", "n_triangles"])
