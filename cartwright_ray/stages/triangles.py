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


def clustering_coefficient(edges_ds, a_col: str = "a", b_col: str = "b"):
    """Local clustering coefficient per node (Watts & Strogatz 1998):
    c(v) = 2·T(v) / (deg(v)·(deg(v)−1)), T(v) = triangles through v.

    Same wedge-closure plan as :func:`triangle_count`, but wedges carry
    their lowest vertex so the closure can credit ALL THREE corners:
    the union of wedge rows (x, y, z) and edge rows is hash-exchanged
    on the closing key (y, z); the whole-block kernel finds groups with
    an edge present and scatters one credit per corner per closed
    wedge. T(v) and deg(v) are then two narrow groupby sums, and the
    coefficient is one shared float expression over exact integers —
    bit-exact against the DuckDB replay. → Dataset (node, deg, tri,
    coeff)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .partition import drop_empty_blocks, hash_partitioned

    dedup = (edges_ds.groupby([a_col, b_col])
             .aggregate(Sum(a_col, alias_name="_s"))
             .select_columns([a_col, b_col]).materialize())

    def wedge_rows(t: pa.Table) -> pa.Table:
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
        keep = b[i] < b[j]
        i, j = i[keep], j[keep]
        wedges = pa.table({"y": pa.array(b[i]), "z": pa.array(b[j]),
                           "x": pa.array(a[i]),
                           "is_edge": pa.array(np.zeros(len(i),
                                                        np.int64))})
        own = pa.table({"y": pa.array(a), "z": pa.array(b),
                        "x": pa.array(np.zeros(len(a), np.int64)),
                        "is_edge": pa.array(np.ones(len(a), np.int64))})
        return pa.concat_tables([wedges, own])

    # wedge generation needs low-vertex co-location; the closure needs
    # (y, z) co-location — two exchanges, both narrow
    low = hash_partitioned(dedup, [a_col], rows_per_partition=25_000)
    tagged = low.map_batches(wedge_rows, batch_format="pyarrow",
                             batch_size=None)
    keyed = hash_partitioned(drop_empty_blocks(tagged), ["y", "z"],
                             rows_per_partition=50_000)

    def close_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64())})
        y = np.asarray(t["y"], np.int64)
        z = np.asarray(t["z"], np.int64)
        x = np.asarray(t["x"], np.int64)
        ie = np.asarray(t["is_edge"], np.int64)
        order = np.lexsort((z, y))
        y, z, x, ie = y[order], z[order], x[order], ie[order]
        new = np.r_[True, (y[1:] != y[:-1]) | (z[1:] != z[:-1])]
        gid = np.cumsum(new) - 1
        has_edge = np.bincount(gid, weights=ie).astype(np.int64) > 0
        closed = has_edge[gid] & (ie == 0)
        nodes = np.concatenate([x[closed], y[closed], z[closed]])
        if not len(nodes):
            return pa.table({"node": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64())})
        g = pd.Series(1, index=nodes).groupby(level=0).sum()
        return pa.table({"node": pa.array(g.index.to_numpy(np.int64)),
                         "tri": pa.array(g.to_numpy(np.int64))})

    tri = (drop_empty_blocks(
               keyed.map_batches(close_kernel, batch_format="pyarrow",
                                 batch_size=None))
           .groupby("node").aggregate(Sum("tri", alias_name="tri"))
           .to_pandas())

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(t[a_col], np.int64),
                            np.asarray(t[b_col], np.int64)])
        g = pd.Series(1, index=v).groupby(level=0).sum()
        return pa.table({"node": pa.array(g.index.to_numpy(np.int64)),
                         "deg": pa.array(g.to_numpy(np.int64))})

    deg = (dedup.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("deg", alias_name="deg"))
           .to_pandas())
    out = deg.merge(tri, on="node", how="left")
    out["tri"] = out["tri"].fillna(0).astype(np.int64)
    d = out["deg"].to_numpy(np.float64)
    tr = out["tri"].to_numpy(np.float64)
    out["coeff"] = np.where(out["deg"] < 2, 0.0,
                            2.0 * tr / (d * (d - 1.0)))
    return out.sort_values("node").reset_index(drop=True)


RA_FP_ONE = 1 << 40          # fixed-point 1.0 for resource-allocation


def link_prediction_ra(edges_ds, k: int = 100,
                       a_col: str = "a", b_col: str = "b"):
    """Link prediction by common-neighbor evidence: for every
    non-adjacent pair (u < v) with ≥1 common neighbor, the
    common-neighbor count and the Resource-Allocation index
    (Zhou, Lü & Zhang 2009 — the Adamic-Adar family's 1/deg variant)
    in 2⁴⁰ fixed point:

        ra_int(u,v) = Σ_{w ∈ N(u)∩N(v)} ⌊2⁴⁰ / deg(w)⌋

    Fixed point keeps every quantity int64 (the integer-PageRank
    precedent): a float Σ 1/deg would sum in engine-dependent order;
    ⌊2⁴⁰/deg⌋ is exact in any engine and the closing ``ra`` is one
    float division per OUTPUT row. Quantization error < deg·2⁻⁴⁰ —
    unobservable at any real degree.

    Scale shape: canonical dedup groupby → both-direction scatter →
    ONE hash exchange on the CENTER node (each group's size IS the
    degree, so no degree join) → m² in-block pair decode (cost
    Σ deg² — the wedge bound; degree-ordering slots in for power-law
    skew as in :func:`triangle_count`) → (u,v)-keyed groupby summing
    (cn, ra_int) with tagged edge rows excluding existing links →
    top-k on the aggregate by (ra_int, cn) with (a,b) tie-break.

    → pandas (a, b, cn, ra_int, ra) of the top-k predicted links."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .partition import drop_empty_blocks, hash_partitioned

    dedup = (edges_ds.groupby([a_col, b_col])
             .aggregate(Sum(a_col, alias_name="_s"))
             .select_columns([a_col, b_col]).materialize())

    def scatter(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col], np.int64)
        b = np.asarray(t[b_col], np.int64)
        return pa.table({"w": pa.array(np.r_[a, b]),
                         "nbr": pa.array(np.r_[b, a])})

    parted = hash_partitioned(
        dedup.map_batches(scatter, batch_format="pyarrow"), ["w"],
        rows_per_partition=25_000)
    empty_cols = ["a", "b", "cn", "ra_int", "ra"]
    if parted is None:
        return pd.DataFrame(columns=empty_cols)

    pair_schema = pa.schema([pa.field("a", pa.int64()),
                             pa.field("b", pa.int64()),
                             pa.field("cn", pa.int64()),
                             pa.field("ra", pa.int64()),
                             pa.field("e", pa.int64())])

    def pair_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        w = np.asarray(t["w"], np.int64)
        nbr = np.asarray(t["nbr"], np.int64)
        order = np.lexsort((nbr, w))
        w, nbr = w[order], nbr[order]
        new = np.r_[True, w[1:] != w[:-1]]
        starts = np.flatnonzero(new)
        m = np.r_[starts[1:], len(w)] - starts
        weight = RA_FP_ONE // m                 # ⌊2⁴⁰ / deg(center)⌋
        n2 = m * m
        rep = np.repeat(np.arange(len(m)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        i = starts[rep] + tloc // m[rep]
        j = starts[rep] + tloc % m[rep]
        keep = nbr[i] < nbr[j]
        rep = rep[keep]
        return pa.table({"a": pa.array(nbr[i][keep]),
                         "b": pa.array(nbr[j][keep]),
                         "cn": pa.array(np.ones(len(rep), np.int64)),
                         "ra": pa.array(weight[rep]),
                         "e": pa.array(np.zeros(len(rep), np.int64))})

    pairs = parted.map_batches(pair_kernel, batch_format="pyarrow",
                               batch_size=None)
    edge_tags = dedup.map_batches(
        lambda t: pa.table({
            "a": t[a_col].combine_chunks(),
            "b": t[b_col].combine_chunks(),
            "cn": pa.array(np.zeros(t.num_rows, np.int64)),
            "ra": pa.array(np.zeros(t.num_rows, np.int64)),
            "e": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")

    clean = drop_empty_blocks(pairs.union(edge_tags))
    if clean is None:
        return pd.DataFrame(columns=empty_cols)
    agg = (clean.groupby(["a", "b"])
           .aggregate(Sum("cn", alias_name="cn"),
                      Sum("ra", alias_name="ra_int"),
                      Sum("e", alias_name="e")))
    def non_edges(t: pa.Table) -> pa.Table:
        e = np.asarray(t["e"], np.int64)
        cn = np.asarray(t["cn"], np.int64)
        return t.filter(pa.array((e == 0) & (cn > 0)))

    top = (agg.map_batches(non_edges, batch_format="pyarrow")
           .sort(["ra_int", "cn", "a", "b"],
                 descending=[True, True, False, False])
           .limit(k).to_pandas())
    top = top.drop(columns=["e"])
    top["ra"] = top["ra_int"].to_numpy(np.int64) / float(RA_FP_ONE)
    return top[empty_cols]
