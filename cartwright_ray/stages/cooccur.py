"""Bipartite projection / co-occurrence network: project a (entity,
item) bipartite relation onto the ITEM side — for every item pair, the
number of entities exhibiting both. The classic market-basket /
co-usage graph builder (the item-side dual of the per-entity set ops
in ``pipelines.relational.user_set_ops``).

Scale shape: per-block DISTINCT (entity, item) partials shrink the
input before anything moves; ONE hash exchange on the ENTITY key
co-locates each entity's item set; the whole-block kernel expands the
per-entity i<j item pairs (cost Σ|set|² — bounded by the item-domain
size when items are categories, the documented boundary for
unbounded item domains is the same degree-ordering fix as the wedge
joins); a final narrow groupby sums pair counts. Integer end to end —
the DuckDB replay (DISTINCT pairs self-join) is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def cooccurrence(ds, entity_col: str = "user_id",
                 item_col: str = "event_type") -> pd.DataFrame:
    """→ pandas (item_a, item_b, n_entities) for every item pair
    co-exhibited by ≥1 entity, item_a < item_b, sorted."""
    from ray.data.aggregate import Count, Sum

    from .partition import hash_partitioned

    def distinct_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "e": t[entity_col].to_numpy(zero_copy_only=False),
            "i": t[item_col].to_numpy(zero_copy_only=False)})
        g = df.drop_duplicates()
        return pa.table({"e": pa.array(g["e"]), "i": pa.array(g["i"])})

    pres = (ds.map_batches(distinct_partial, batch_format="pyarrow")
            .groupby(["e", "i"])
            .aggregate(Count(alias_name="_c"))
            .select_columns(["e", "i"]))

    parted = hash_partitioned(pres, ["e"])
    if parted is None:
        return pd.DataFrame(columns=["item_a", "item_b", "n_entities"])

    pair_schema = pa.schema([pa.field("item_a", pa.string()),
                             pa.field("item_b", pa.string()),
                             pa.field("n", pa.int64())])

    def pair_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        e = np.asarray(t["e"], np.int64)
        i = t["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, e))
        e, i = e[order], i[order]
        new = np.r_[True, e[1:] != e[:-1]]
        starts = np.flatnonzero(new)
        m = np.r_[starts[1:], len(e)] - starts
        n2 = m * m
        rep = np.repeat(np.arange(len(m)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        ii = starts[rep] + tloc // m[rep]
        jj = starts[rep] + tloc % m[rep]
        keep = ii < jj                     # sorted i ⇒ i[ii] <= i[jj]
        return pa.table({
            "item_a": pa.array(i[ii[keep]], pa.string()),
            "item_b": pa.array(i[jj[keep]], pa.string()),
            "n": pa.array(np.ones(int(keep.sum()), np.int64))})

    out = (parted.map_batches(pair_kernel, batch_format="pyarrow",
                              batch_size=None)
           .groupby(["item_a", "item_b"])
           .aggregate(Sum("n", alias_name="n_entities"))
           .to_pandas())
    if out.empty:            # no entity has ≥2 items: keep the schema
        return pd.DataFrame({"item_a": pd.Series(dtype=object),
                             "item_b": pd.Series(dtype=object),
                             "n_entities": pd.Series(dtype="int64")})
    return out.sort_values(["item_a", "item_b"]).reset_index(drop=True)
