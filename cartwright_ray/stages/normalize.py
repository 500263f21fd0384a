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
