"""Per-key feature normalization (z-score) — a standard training-data
preprocessing stage, expressed as pre-aggregated partials + a broadcast
of the tiny per-key moment table.

Cross-engine exactness: moments are accumulated as INTEGER cent sums
(``floor(v*100 + 0.5)``) — identical int64 values in numpy and SQL — and
mean/variance/z are derived from those integers with the same float
expressions, so the DuckDB oracle hashes bit-identically (float sums
associate differently engine-to-engine; integer sums cannot). int64
bounds the per-key row count at ~9e8 rows (cents² ≈ 1e10 each) — beyond
that, split keys or widen to float at a documented precision cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _cents(v: np.ndarray) -> np.ndarray:
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def zscore_by_key(ds, key_col: str, val_col: str, scale: float = 1e6):
    """Append ``z`` = (v − mean_key) / std_pop_key, floored at ``scale``.

    Two passes: per-block (key, n, Σcents, Σcents²) partials — the
    shuffle carries one row per key per block — then the per-key moment
    table (O(keys)) is collected once, broadcast via ``ray.put``, and a
    stateless vectorized map emits z. Keys with zero variance get z=0.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        c = _cents(np.asarray(t[val_col], dtype=np.float64))
        df = pd.DataFrame({"k": t[key_col].to_numpy(zero_copy_only=False),
                           "n": 1, "s": c, "q": c * c})
        g = df.groupby("k", sort=False).sum().reset_index()
        return pa.table({key_col: pa.array(g["k"]),
                         "n": pa.array(g["n"], pa.int64()),
                         "s": pa.array(g["s"], pa.int64()),
                         "q": pa.array(g["q"], pa.int64())})

    moments = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(key_col)
               .aggregate(Sum("n", alias_name="n"),
                          Sum("s", alias_name="s"),
                          Sum("q", alias_name="q"))
               .to_pandas())
    stats = {}
    for _, r in moments.iterrows():
        n, sm, q = float(r["n"]), float(r["s"]), float(r["q"])
        mean = sm / n / 100.0
        var = q / n / 10000.0 - mean * mean
        stats[r[key_col]] = (mean, np.sqrt(var) if var > 0 else 0.0)
    ref = ray.put(stats)

    def apply_z(t: pa.Table) -> pa.Table:
        import pandas as pd
        st = ray.get(ref)
        keys = pd.Series(t[key_col].to_numpy(zero_copy_only=False))
        v = _cents(np.asarray(t[val_col], dtype=np.float64)) / 100.0
        mean = keys.map({k: m for k, (m, _) in st.items()}).to_numpy()
        std = keys.map({k: s for k, (_, s) in st.items()}).to_numpy()
        z = np.where(std > 0, (v - mean) / np.where(std > 0, std, 1.0), 0.0)
        z = np.floor(z * scale) / scale
        return t.append_column("z", pa.array(z, pa.float64()))

    return ds.map_batches(apply_z, batch_format="pyarrow")


def winsorize_by_key(ds, key_col: str, val_col: str,
                     q_lo: tuple[int, int] = (10, 100),
                     q_hi: tuple[int, int] = (90, 100)):
    """Per-key percentile clipping (winsorization) with ORDER-STATISTIC
    quantiles: the lo/hi bounds are the k-th smallest EXISTING values at
    integer rank ``k = (n*qn + qd - 1) // qd`` (1-based) — no
    interpolation, so bounds and clipped outputs are bit-exact doubles a
    SQL oracle reproduces with a row_number() rank.

    Two passes: (1) a narrow (key, value) exchange computes per-key
    bounds — O(keys) to the driver; (2) a broadcast vectorized clip map.
    For very-high-cardinality keys swap pass 1 for the mergeable sketch
    (``relational.sketch_quantiles_by_type``) and accept approximate
    bounds."""
    import ray

    def per_key_bounds(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[val_col].to_numpy(dtype=np.float64))
        n = len(v)
        k_lo = (n * q_lo[0] + q_lo[1] - 1) // q_lo[1]
        k_hi = (n * q_hi[0] + q_hi[1] - 1) // q_hi[1]
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "lo": [v[max(k_lo - 1, 0)]],
                             "hi": [v[max(k_hi - 1, 0)]]})

    narrow = ds.select_columns([key_col, val_col])
    bounds = narrow.groupby(key_col) \
        .map_groups(per_key_bounds, batch_format="pandas").to_pandas()
    lut = {r[key_col]: (r["lo"], r["hi"]) for _, r in bounds.iterrows()}
    lut_ref = ray.put(lut)

    def clip(t: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        ks = sorted(m)
        los = np.array([m[k][0] for k in ks])
        his = np.array([m[k][1] for k in ks])
        idx = np.asarray(pc.index_in(t[key_col],
                                     value_set=pa.array(ks)).fill_null(0),
                         dtype=np.int64)
        v = np.asarray(t[val_col], dtype=np.float64)
        return t.append_column("value_clipped",
                               pa.array(np.minimum(np.maximum(v, los[idx]),
                                                   his[idx]), pa.float64()))

    return ds.map_batches(clip, batch_format="pyarrow")


def mad_outliers_by_key(ds, key_col: str, val_col: str,
                        n_mads: int = 3) -> pd.DataFrame:
    """Per-key robust outlier statistics via median / MAD — the
    median-absolute-deviation rule (Hampel identifier), all-integer for
    cross-engine exactness.

    Values quantize to cents (``floor(v*100+0.5)``, same as
    ``zscore_by_key``); the median is the LOWER median — the k-th
    smallest with 1-based ``k = (n+1)//2`` (an existing value, no
    interpolation), MAD is the lower median of ``|c - med|``, and a row
    is an outlier iff ``|c - med| > n_mads * MAD`` — pure int64
    comparisons a SQL ``row_number()`` rank replays bit-exactly.

    One narrow (key, value) exchange; each key's rows land in one
    ``map_groups`` task (same shape and the same documented
    high-cardinality boundary as ``winsorize_by_key``: beyond ~1e8 rows
    per key, swap in the mergeable quantile sketch and accept
    approximate medians). Output: one row per key —
    (key, n, median_cents, mad_cents, n_outliers) — sorted by key.
    """
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(_cents(g[val_col].to_numpy(dtype=np.float64)))
        n = len(c)
        med = int(c[(n + 1) // 2 - 1])
        dev = np.sort(np.abs(c - med))
        mad = int(dev[(n + 1) // 2 - 1])
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "n": [n],
                             "median_cents": [med],
                             "mad_cents": [mad],
                             "n_outliers": [int((dev > n_mads * mad)
                                                .sum())]})

    narrow = ds.select_columns([key_col, val_col])
    out = narrow.groupby(key_col) \
        .map_groups(per_key, batch_format="pandas").to_pandas()
    out = out.sort_values(key_col).reset_index(drop=True)
    for col in ("n", "median_cents", "mad_cents", "n_outliers"):
        out[col] = out[col].astype("int64")
    return out


def percentile_rank_by_key(ds, key_col: str = "event_type",
                           val_col: str = "value",
                           id_col: str = "event_id") -> pd.DataFrame:
    """Empirical-CDF (quantile) transform — each row's percentile rank
    within its key: pr = (rank − 1)/(n − 1), rank by (value, id) so
    ties resolve deterministically (row_number semantics, mirrored in
    the oracle's window). The standard rank-gaussianization front half
    of feature engineering.

    Scale shape: ONE sort exchange keyed on the key column alone, then
    a whole-block kernel — per-key rank and count are one lexsort +
    segment arithmetic across ALL keys in the block; ranks are exact
    integers and pr is one closing float division per row.

    → pandas (id, key, value, rank, pr) sorted by (key, rank)."""
    from .partition import key_segments

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                pa.field(id_col, pa.int64()),
                pa.field(key_col, pa.string()),
                pa.field(val_col, pa.float64()),
                pa.field("rank", pa.int64()),
                pa.field("pr", pa.float64())]).empty_table()
        k = t[key_col].to_numpy(zero_copy_only=False)
        v = np.asarray(t[val_col], np.float64)
        i = np.asarray(t[id_col], np.int64)
        order = np.lexsort((i, v, k))
        k, v, i = k[order], v[order], i[order]
        starts, seg = key_segments(k)
        n = np.diff(np.r_[starts, len(k)])
        rank = np.arange(len(k), dtype=np.int64) - starts[seg] + 1
        denom = (n[seg] - 1).astype(np.float64)
        pr = np.where(denom > 0, (rank - 1) / np.where(denom > 0,
                                                       denom, 1.0), 0.0)
        return pa.table({id_col: pa.array(i),
                         key_col: pa.array(k, pa.string()),
                         val_col: pa.array(v, pa.float64()),
                         "rank": pa.array(rank),
                         "pr": pa.array(pr, pa.float64())})

    out = (ds.sort(key_col)
           .map_batches(kernel, batch_format="pyarrow",
                        batch_size=None).to_pandas())
    return out.sort_values([key_col, "rank"]).reset_index(drop=True)
