"""Pivot (long → wide): one row per key, one column per pivot value —
the classic reshape every reporting pipeline ends with (reference has
no relational layer; engine surface, SURVEY §2.7 family).

Scale plan: each block computes a WIDE partial (pandas crosstab /
pivot_table — vectorized C) over the ``pivot_values`` column set, then
ONE ``groupby(key)`` with a native Sum per pivot column merges the
partials — the shuffle carries O(distinct keys per block × P) rows,
never the raw events. ``pivot_values`` is explicit by default-None
discovery, but at scale callers should PASS it (a fixed output schema
is a contract, not something to discover from 100 TB of data; the
discovery path is one tiny distinct over the pivot column).

``agg="count"`` is integer-exact (cross-engine comparable).
``agg="sum"`` sums floats in engine block order — bit-equality with a
SQL oracle is NOT guaranteed for floats (use integer-cent values for
exact replay, same rule as stages/normalize.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot(ds, key_col: str, pivot_col: str, value_col: str | None = None,
          agg: str = "count", pivot_values: list | None = None,
          small_limit: int = 262_144):
    """Wide Dataset: ``key_col`` + one int64/float64 column per pivot
    value (missing combinations are 0). Partial sets at or under
    ``small_limit`` rows merge on the driver (one vectorized pandas
    groupby — O(keys × P), the exact_dedup boundary pattern) instead of
    paying the distributed aggregate's spin-up; ``small_limit=0`` forces
    the distributed merge (tests run both)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if agg not in ("count", "sum"):
        raise ValueError(f"unsupported agg {agg!r}")
    if agg == "sum" and value_col is None:
        raise ValueError("agg='sum' needs value_col")

    if pivot_values is None:
        vals = (ds.select_columns([pivot_col])
                .groupby(pivot_col).count().to_pandas()[pivot_col])
        pivot_values = sorted(str(v) for v in vals)
    pivot_values = [str(v) for v in pivot_values]
    if key_col in pivot_values:
        # a pivot value whose string equals key_col would overwrite the
        # key column in the wide partial and corrupt the merge (ADVICE r03)
        raise ValueError(
            f"pivot value {key_col!r} collides with key_col; rename the "
            f"key column or remap the colliding value upstream")

    cols = [key_col, pivot_col] + ([value_col] if value_col else [])

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        pv = df[pivot_col].astype(str)
        if agg == "count":
            w = pd.crosstab(df[key_col], pv)
        else:
            w = df.pivot_table(index=key_col, columns=pv,
                               values=value_col, aggfunc="sum",
                               fill_value=0)
        w = w.reindex(columns=pivot_values, fill_value=0)
        w.columns = list(pivot_values)
        w = w.reset_index()
        out = {key_col: w[key_col].to_numpy()}
        dtype = np.int64 if agg == "count" else np.float64
        for c in pivot_values:
            out[c] = w[c].to_numpy().astype(dtype)
        return pa.table(out)

    partials = ds.map_batches(partial,
                              batch_format="pyarrow").materialize()
    if partials.count() <= small_limit:
        import ray.data
        df = partials.to_pandas().groupby(key_col, as_index=False)[
            pivot_values].sum()
        return ray.data.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False))
    aggs = [Sum(c, alias_name=c) for c in pivot_values]
    return partials.groupby(key_col).aggregate(*aggs)


def melt(ds, key_col: str, value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """Unpivot (wide → long): one output row per (key, value column) —
    the inverse of :func:`pivot`. Pure streaming fan-out inside
    ``map_batches`` (zero-copy column reuse, no shuffle, no state)."""

    value_cols = list(value_cols)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = pa.concat_arrays(
            [t.column(key_col).combine_chunks()] * len(value_cols))
        names = pa.array(np.repeat(np.array(value_cols, dtype=object), n),
                         pa.string())
        vals = pa.concat_arrays(
            [t.column(c).cast(pa.float64()).combine_chunks()
             for c in value_cols])
        return pa.table({key_col: keys, var_name: names,
                         value_name: vals})

    return ds.map_batches(explode, batch_format="pyarrow")
