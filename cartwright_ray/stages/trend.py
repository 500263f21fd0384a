"""Per-key OLS trend (least-squares slope of value vs. time) — the
standard drift/regression primitive of a metrics pipeline, expressed as
pre-aggregated integer moments + an O(keys) driver combine.

Cross-engine exactness (the :mod:`.normalize` discipline): x is REBASED
integer hours since 2020-01-01 (``epoch_us // 3_600_000_000 − 438_288``,
exact for post-1970 timestamps where floor and trunc division agree) and
y is integer cents (``floor(v*100 + 0.5)``), so every per-block partial
(n, Σx, Σy, Σxy, Σx²) is an exact int64 sum. The per-key combine runs
in Python arbitrary-precision ints — bit-identical to DuckDB's HUGEINT
``sum()`` — and the closing slope is ONE float expression,
``float(nΣxy − ΣxΣy) / float(nΣx² − (Σx)²) / 100``, both engines
correctly rounding the same two integers. int64 partial bounds: x ≈ 6e4
(2027) ⇒ x² ≈ 3.6e9 ⇒ ~2.5e9 rows per key per BLOCK before Σx²
overflows — far beyond any block size; the cross-block combine is
unbounded (Python ints / HUGEINT).

Scale shape: one narrow shuffle of (key, 5 ints) per block per key; the
moment table is O(keys) on the driver — same cost class as the
driver-green ``zscore`` and ``hll_distinct`` reduces. No reference
analogue (the reference stops at column classification).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HOURS_OFFSET = 438_288          # 2020-01-01T00:00Z in epoch hours
_US_PER_HOUR = 3_600_000_000


def _xy(t: pa.Table, ts_col: str, val_col: str):
    ts = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
    x = np.asarray(ts, np.int64) // _US_PER_HOUR - HOURS_OFFSET
    v = np.asarray(t[val_col], np.float64)
    y = np.floor(v * 100.0 + 0.5).astype(np.int64)
    return x, y


def trend_by_key(ds, key_col: str = "event_type", ts_col: str = "ts",
                 val_col: str = "value") -> pd.DataFrame:
    """→ pandas (key_col, n, slope): per-key OLS slope in value-units
    per hour; keys with zero x-variance get slope 0.0."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x, y = _xy(t, ts_col, val_col)
        df = pd.DataFrame({"k": t[key_col].to_numpy(zero_copy_only=False),
                           "n": 1, "sx": x, "sy": y, "sxy": x * y,
                           "sxx": x * x})
        g = df.groupby("k", sort=False).sum().reset_index()
        return pa.table({key_col: pa.array(g["k"]),
                         "n": pa.array(g["n"], pa.int64()),
                         "sx": pa.array(g["sx"], pa.int64()),
                         "sy": pa.array(g["sy"], pa.int64()),
                         "sxy": pa.array(g["sxy"], pa.int64()),
                         "sxx": pa.array(g["sxx"], pa.int64())})

    m = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby(key_col)
         .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                    Sum("sy", alias_name="sy"),
                    Sum("sxy", alias_name="sxy"),
                    Sum("sxx", alias_name="sxx"))
         .to_pandas())
    rows = []
    for _, r in m.iterrows():
        # Python ints: exact, HUGEINT-equivalent
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * int(r["sxy"]) - sx * sy
        den = n * int(r["sxx"]) - sx * sx
        slope = float(num) / float(den) / 100.0 if den else 0.0
        rows.append((r[key_col], n, slope))
    return (pd.DataFrame(rows, columns=[key_col, "n", "slope"])
            .sort_values(key_col).reset_index(drop=True))
