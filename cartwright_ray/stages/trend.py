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


def acf_by_key(ds, lags=(1, 2, 3, 4, 5, 6, 7),
               key_col: str = "event_type", ts_col: str = "ts",
               bin_us: int = 86_400_000_000) -> pd.DataFrame:
    """Sample autocorrelation of each key's time-binned event counts at
    the given lags — the seasonality/persistence diagnostic of a
    metrics pipeline:

        r_k = Σ_{t<n−k} (c_t − c̄)(c_{t+k} − c̄) / Σ_t (c_t − c̄)²

    over the DENSE global bin range (missing bins count 0, so a bursty
    key's quiet days depress its ACF — the same dense-range convention
    as :func:`.hotspot.mann_kendall_cells`).

    Scale shape: per-block (key, bin) count partials → one groupby sum
    (shuffle bounded by keys × bins per block), O(1) driver range
    reduce, then ONE hash exchange on the key and a whole-block dense
    kernel — after the exchange every per-key moment is block-local,
    so the lag products P_k = Σ c_t·c_{t+k} and the head/tail sums are
    np.dot/slice-sums per (key, lag), never a second shuffle.

    Exactness: every moment (S, SS, P_k, H_k, T_k) is exact int64; the
    numerator expansion Σ(c_t−c̄)(c_{t+k}−c̄) = P_k − c̄(H_k+T_k)
    + (n−k)c̄² and the denominator SS − S·(S/n) are each ONE float
    expression over those integers, mirrored token-for-token in the
    DuckDB generate_series + lag-self-join replay.

    → pandas (key_col, lag, n_bins, r) sorted by (key, lag)."""
    from ray.data.aggregate import Sum

    from .partition import hash_partitioned

    lags = sorted(int(k) for k in lags)

    def cb_partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        b = ts // bin_us
        df = pd.DataFrame({"k": t[key_col].to_numpy(
            zero_copy_only=False), "b": b, "n": 1})
        g = df.groupby(["k", "b"], sort=False).sum().reset_index()
        return pa.table({key_col: pa.array(g["k"]),
                         "b": pa.array(g["b"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    cb = (ds.map_batches(cb_partial, batch_format="pyarrow")
          .groupby([key_col, "b"])
          .aggregate(Sum("n", alias_name="n"))
          .materialize())             # PIN: range reduce + exchange

    rng = cb.map_batches(
        lambda t: pa.table({"d0": [int(np.asarray(t["b"]).min())],
                            "d1": [int(np.asarray(t["b"]).max())]}),
        batch_format="pyarrow").to_pandas()
    if rng.empty:
        return pd.DataFrame(columns=[key_col, "lag", "n_bins", "r"])
    d0, d1 = int(rng["d0"].min()), int(rng["d1"].max())
    nbins = d1 - d0 + 1

    parted = hash_partitioned(cb, [key_col])
    if parted is None:
        return pd.DataFrame(columns=[key_col, "lag", "n_bins", "r"])

    out_schema = pa.schema([pa.field(key_col, pa.string()),
                            pa.field("lag", pa.int64()),
                            pa.field("n_bins", pa.int64()),
                            pa.field("r", pa.float64())])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        b = np.asarray(t["b"], np.int64) - d0
        n = np.asarray(t["n"], np.int64)
        order = np.argsort(keys, kind="stable")
        keys, b, n = keys[order], b[order], n[order]
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(keys)]
        out_k, out_lag, out_r = [], [], []
        for s, e in zip(starts, ends):
            c = np.zeros(nbins, np.int64)
            c[b[s:e]] = n[s:e]
            S, SS = int(c.sum()), int((c * c).sum())
            xbar = float(S) / float(nbins)
            den = float(SS) - float(S) * xbar
            for k in lags:
                if k >= nbins or not (den > 0.0):
                    r = 0.0
                else:
                    P = int(np.dot(c[:-k], c[k:]))
                    H = int(c[:-k].sum())
                    T = int(c[k:].sum())
                    num = float(P) - xbar * float(H + T) \
                        + float(nbins - k) * xbar * xbar
                    r = num / den
                out_k.append(keys[s])
                out_lag.append(k)
                out_r.append(r)
        return pa.table({key_col: pa.array(out_k, pa.string()),
                         "lag": pa.array(out_lag, pa.int64()),
                         "n_bins": pa.array(
                             np.full(len(out_k), nbins, np.int64)),
                         "r": pa.array(out_r, pa.float64())})

    out = parted.map_batches(kernel, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return out.sort_values([key_col, "lag"]).reset_index(drop=True)


def trend_r2_by_key(ds, key_col: str = "event_type", ts_col: str = "ts",
                    val_col: str = "value") -> pd.DataFrame:
    """Per-key OLS slope WITH goodness-of-fit — the same rebased-hour /
    integer-cent moment discipline as :func:`trend_by_key` plus the Σy²
    moment, closing with

        r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²) · (nΣy² − (Σy)²))

    evaluated as (CAST·CAST)/(CAST·CAST) over exact Python-int
    (HUGEINT-equivalent) products — one shared float expression, so the
    DuckDB replay is bit-exact. Zero x- or y-variance keys report
    slope 0 / r² 0 (a flat series fits no line).

    → pandas (key, n, slope, r2) sorted."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x, y = _xy(t, ts_col, val_col)
        df = pd.DataFrame({"k": t[key_col].to_numpy(
            zero_copy_only=False), "n": 1, "sx": x, "sy": y,
            "sxy": x * y, "sxx": x * x, "syy": y * y})
        g = df.groupby("k", sort=False).sum().reset_index()
        return pa.table({key_col: pa.array(g["k"]),
                         "n": pa.array(g["n"], pa.int64()),
                         "sx": pa.array(g["sx"], pa.int64()),
                         "sy": pa.array(g["sy"], pa.int64()),
                         "sxy": pa.array(g["sxy"], pa.int64()),
                         "sxx": pa.array(g["sxx"], pa.int64()),
                         "syy": pa.array(g["syy"], pa.int64())})

    m = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby(key_col)
         .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                    Sum("sy", alias_name="sy"),
                    Sum("sxy", alias_name="sxy"),
                    Sum("sxx", alias_name="sxx"),
                    Sum("syy", alias_name="syy"))
         .to_pandas())
    rows = []
    for _, r in m.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * int(r["sxy"]) - sx * sy
        dx = n * int(r["sxx"]) - sx * sx
        dy = n * int(r["syy"]) - sy * sy
        slope = float(num) / float(dx) / 100.0 if dx else 0.0
        r2 = (float(num) * float(num)) / (float(dx) * float(dy)) \
            if dx and dy else 0.0
        rows.append((r[key_col], n, slope, r2))
    return (pd.DataFrame(rows, columns=[key_col, "n", "slope", "r2"])
            .sort_values(key_col).reset_index(drop=True))


def rolling_anomaly_by_key(ds, window: int = 7,
                           key_col: str = "event_type",
                           ts_col: str = "ts",
                           bin_us: int = 86_400_000_000
                           ) -> pd.DataFrame:
    """Rolling anomaly-day detection: for every (key, day) over the
    DENSE global range, the trailing ``window``-day mean/variance of
    the daily counts (window includes the current day; early days use
    the shorter prefix — the SQL ROWS-frame convention) and a 2σ flag
    in SQUARED form, (x − μ)² > 4·(Σx²/w − μ²), so no sqrt enters the
    comparison. Counts and window sums are exact int64 via prefix
    sums; μ and the flag are shared float expressions.

    Same dense-kernel scale shape as :func:`acf_by_key`: (key, bin)
    partials → one groupby → O(1) range reduce → ONE key exchange →
    per-key prefix-sum kernel. → pandas (key, day, x, w, mu,
    is_anomaly) sorted."""
    from ray.data.aggregate import Sum

    from .partition import hash_partitioned

    def cb_partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        df = pd.DataFrame({"k": t[key_col].to_numpy(
            zero_copy_only=False), "b": ts // bin_us, "n": 1})
        g = df.groupby(["k", "b"], sort=False).sum().reset_index()
        return pa.table({key_col: pa.array(g["k"]),
                         "b": pa.array(g["b"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    cb = (ds.map_batches(cb_partial, batch_format="pyarrow")
          .groupby([key_col, "b"])
          .aggregate(Sum("n", alias_name="n"))
          .materialize())

    rng = cb.map_batches(
        lambda t: pa.table({"d0": [int(np.asarray(t["b"]).min())],
                            "d1": [int(np.asarray(t["b"]).max())]}),
        batch_format="pyarrow").to_pandas()
    cols = [key_col, "day", "x", "w", "mu", "is_anomaly"]
    if rng.empty:
        return pd.DataFrame(columns=cols)
    d0, d1 = int(rng["d0"].min()), int(rng["d1"].max())
    nb = d1 - d0 + 1

    parted = hash_partitioned(cb, [key_col])
    if parted is None:
        return pd.DataFrame(columns=cols)

    out_schema = pa.schema([
        pa.field(key_col, pa.string()), pa.field("day", pa.int64()),
        pa.field("x", pa.int64()), pa.field("w", pa.int64()),
        pa.field("mu", pa.float64()),
        pa.field("is_anomaly", pa.int64())])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        b = np.asarray(t["b"], np.int64) - d0
        n = np.asarray(t["n"], np.int64)
        order = np.argsort(keys, kind="stable")
        keys, b, n = keys[order], b[order], n[order]
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(keys)]
        out = {c: [] for c in cols}
        idx = np.arange(nb)
        w = np.minimum(idx + 1, window).astype(np.int64)
        lo = idx - w                      # exclusive prefix index
        for s, e in zip(starts, ends):
            c = np.zeros(nb, np.int64)
            c[b[s:e]] = n[s:e]
            p1 = np.r_[0, np.cumsum(c)]
            p2 = np.r_[0, np.cumsum(c * c)]
            S = p1[idx + 1] - p1[lo + 1]
            SS = p2[idx + 1] - p2[lo + 1]
            fw = w.astype(np.float64)
            mu = S / fw
            var = SS / fw - mu * mu
            x = c.astype(np.float64)
            flag = ((x - mu) * (x - mu) > 4.0 * var).astype(np.int64)
            out[key_col].extend([keys[s]] * nb)
            out["day"].extend((idx + d0).tolist())
            out["x"].extend(c.tolist())
            out["w"].extend(w.tolist())
            out["mu"].extend(mu.tolist())
            out["is_anomaly"].extend(flag.tolist())
        return pa.table({key_col: pa.array(out[key_col], pa.string()),
                         "day": pa.array(out["day"], pa.int64()),
                         "x": pa.array(out["x"], pa.int64()),
                         "w": pa.array(out["w"], pa.int64()),
                         "mu": pa.array(out["mu"], pa.float64()),
                         "is_anomaly": pa.array(out["is_anomaly"],
                                                pa.int64())})

    out = parted.map_batches(kernel, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return out.sort_values([key_col, "day"]).reset_index(drop=True)


def ewma_daily_by_key(ds, key_col: str = "event_type",
                      ts_col: str = "ts",
                      bin_us: int = 86_400_000_000) -> pd.DataFrame:
    """Exponential smoothing of daily counts, α = ½ — the streaming
    forecast/trend primitive: e_t = (e_{t−1} + x_t)/2 over the DENSE
    global bin range (e_{−1} = 0).

    α = ½ is chosen deliberately: every term x_{t−k}·2^{−(k+1)} is an
    exact dyadic rational, and with counts < 2¹² over ≤ 40 bins the
    partial sums span < 52 mantissa bits — so the smoothed value is
    EXACT in float64, in any summation order, in any engine. (General
    α would round at every step and diverge per plan.) The DuckDB
    replay (j ≤ t self-join with power(0.5, t−j+1) weights) is
    bit-identical.

    Same dense-kernel shape as :func:`acf_by_key`; the per-key
    recurrence is a 1-vector loop over ≤bins steps. → pandas
    (key, day, x, ewma) sorted."""
    from ray.data.aggregate import Sum

    from .partition import hash_partitioned

    def cb_partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        df = pd.DataFrame({"k": t[key_col].to_numpy(
            zero_copy_only=False), "b": ts // bin_us, "n": 1})
        g = df.groupby(["k", "b"], sort=False).sum().reset_index()
        return pa.table({key_col: pa.array(g["k"]),
                         "b": pa.array(g["b"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    cb = (ds.map_batches(cb_partial, batch_format="pyarrow")
          .groupby([key_col, "b"])
          .aggregate(Sum("n", alias_name="n"))
          .materialize())

    rng = cb.map_batches(
        lambda t: pa.table({"d0": [int(np.asarray(t["b"]).min())],
                            "d1": [int(np.asarray(t["b"]).max())]}),
        batch_format="pyarrow").to_pandas()
    cols = [key_col, "day", "x", "ewma"]
    if rng.empty:
        return pd.DataFrame(columns=cols)
    d0, d1 = int(rng["d0"].min()), int(rng["d1"].max())
    nb = d1 - d0 + 1

    parted = hash_partitioned(cb, [key_col])
    if parted is None:
        return pd.DataFrame(columns=cols)

    out_schema = pa.schema([
        pa.field(key_col, pa.string()), pa.field("day", pa.int64()),
        pa.field("x", pa.int64()), pa.field("ewma", pa.float64())])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False)
        b = np.asarray(t["b"], np.int64) - d0
        n = np.asarray(t["n"], np.int64)
        order = np.argsort(keys, kind="stable")
        keys, b, n = keys[order], b[order], n[order]
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(keys)]
        out_k, out_d, out_x, out_e = [], [], [], []
        for s, e in zip(starts, ends):
            c = np.zeros(nb, np.int64)
            c[b[s:e]] = n[s:e]
            ew = np.empty(nb, np.float64)
            acc = 0.0
            for i in range(nb):           # bins are bounded (dense)
                acc = (acc + float(c[i])) / 2.0
                ew[i] = acc
            out_k.extend([keys[s]] * nb)
            out_d.extend(range(d0, d1 + 1))
            out_x.extend(c.tolist())
            out_e.extend(ew.tolist())
        return pa.table({key_col: pa.array(out_k, pa.string()),
                         "day": pa.array(out_d, pa.int64()),
                         "x": pa.array(out_x, pa.int64()),
                         "ewma": pa.array(out_e, pa.float64())})

    out = parted.map_batches(kernel, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return out.sort_values([key_col, "day"]).reset_index(drop=True)
