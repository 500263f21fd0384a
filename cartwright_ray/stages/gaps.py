"""Inter-arrival gap quantiles — the latency/cadence diagnostic of an
event pipeline: per event type, exact order-statistic percentiles of
the µs gaps between one user's consecutive events OF THAT TYPE.

Quantiles are Type-1 (inverted-CDF) ORDER STATISTICS — rank
⌈q·n⌉ of the sorted gaps — so every output is an exact int64 drawn
from the data (the linear-interpolation variant would put a float
multiply inside the rank computation, where engines disagree in the
last ulp; the rank formula (n·p + 99) // 100 is pure integer and the
DuckDB row_number replay is bit-exact).

Scale shape: ONE sort exchange on the user key (gaps need within-user
order; the in-block (user, type, ts, id) lexsort and masked diff are
one numpy pass for ALL users), then ONE hash exchange of the narrow
(type, gap) rows to co-locate each type for the sorted rank pick. For
100-TB gap columns the pick stage swaps to a distributed KLL/t-digest
sketch — the documented ``value_quantiles_by_type`` boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PCTS = (50, 90, 99)


def gap_quantiles_by_key(ds, key_col: str = "event_type",
                         entity_col: str = "user_id",
                         ts_col: str = "ts",
                         id_col: str = "event_id") -> pd.DataFrame:
    """→ pandas (key, n_gaps, p50_us, p90_us, p99_us), all int64."""
    from .partition import hash_partitioned

    gap_schema = pa.schema([pa.field(key_col, pa.string()),
                            pa.field("gap", pa.int64())])

    def gap_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return gap_schema.empty_table()
        u = np.asarray(t[entity_col], np.int64)
        k = t[key_col].to_numpy(zero_copy_only=False)
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        eid = np.asarray(t[id_col], np.int64)
        order = np.lexsort((eid, ts, k, u))
        u, k, ts = u[order], k[order], ts[order]
        same = (u[1:] == u[:-1]) & (k[1:] == k[:-1])
        return pa.table({key_col: pa.array(k[1:][same], pa.string()),
                         "gap": pa.array(np.diff(ts)[same])})

    gaps = (ds.sort(entity_col)
            .map_batches(gap_kernel, batch_format="pyarrow",
                         batch_size=None))

    parted = hash_partitioned(gaps, [key_col])
    cols = [key_col, "n_gaps"] + [f"p{p}_us" for p in PCTS]
    if parted is None:
        return pd.DataFrame(columns=cols)

    out_schema = pa.schema([pa.field(key_col, pa.string())] + [
        pa.field(c, pa.int64()) for c in cols[1:]])

    def pick_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        k = t[key_col].to_numpy(zero_copy_only=False)
        g = np.asarray(t["gap"], np.int64)
        order = np.lexsort((g, k))
        k, g = k[order], g[order]
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        n = np.r_[starts[1:], len(k)] - starts
        data = {key_col: pa.array(k[starts], pa.string()),
                "n_gaps": pa.array(n)}
        for p in PCTS:
            idx = starts + (n * p + 99) // 100 - 1   # rank ⌈p·n/100⌉
            data[f"p{p}_us"] = pa.array(g[idx])
        return pa.table(data)

    out = parted.map_batches(pick_kernel, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return out.sort_values(key_col).reset_index(drop=True)


def longest_streak_by_entity(ds, entity_col: str = "user_id",
                             ts_col: str = "ts",
                             bin_us: int = 86_400_000_000
                             ) -> pd.DataFrame:
    """Longest run of CONSECUTIVE active bins (days) per entity — the
    engagement-streak metric, the gaps-and-islands pattern over a
    distinct-bin presence table.

    Scale shape: per-block DISTINCT (entity, bin) partials → one
    groupby dedup → ONE entity-keyed hash exchange → whole-block
    kernel: per-entity sorted bins, run boundaries where Δbin ≠ 1,
    max run via ``np.maximum.reduceat`` over run lengths — one numpy
    pass for ALL entities in the block. Integer end to end; the
    DuckDB replay is the classic bin − row_number() islands trick.

    → pandas (entity, n_active_bins, longest_streak) sorted."""
    from ray.data.aggregate import Count

    from .partition import hash_partitioned

    def pres_partial(t: pa.Table) -> pa.Table:
        u = np.asarray(t[entity_col], np.int64)
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        df = pd.DataFrame({"e": u, "b": ts // bin_us}).drop_duplicates()
        return pa.table({"e": pa.array(df["e"], pa.int64()),
                         "b": pa.array(df["b"], pa.int64())})

    pres = (ds.map_batches(pres_partial, batch_format="pyarrow")
            .groupby(["e", "b"])
            .aggregate(Count(alias_name="_c"))
            .select_columns(["e", "b"]))

    parted = hash_partitioned(pres, ["e"])
    cols = [entity_col, "n_active_bins", "longest_streak"]
    if parted is None:
        return pd.DataFrame(columns=cols)

    out_schema = pa.schema([pa.field(c, pa.int64()) for c in cols])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        e = np.asarray(t["e"], np.int64)
        b = np.asarray(t["b"], np.int64)
        order = np.lexsort((b, e))
        e, b = e[order], b[order]
        ent_starts = np.flatnonzero(np.r_[True, e[1:] != e[:-1]])
        ent_ends = np.r_[ent_starts[1:], len(e)]
        # run starts: new entity OR a day gap
        run_start = np.r_[True, (e[1:] != e[:-1]) | (np.diff(b) != 1)]
        starts = np.flatnonzero(run_start)
        run_len = np.diff(np.r_[starts, len(e)])
        # per entity: max over its runs (runs are contiguous segments
        # of the starts array — map each run to its entity)
        run_ent = e[starts]
        ent_of_run_start = np.flatnonzero(
            np.r_[True, run_ent[1:] != run_ent[:-1]])
        longest = np.maximum.reduceat(run_len, ent_of_run_start)
        return pa.table({
            entity_col: pa.array(run_ent[ent_of_run_start]),
            "n_active_bins": pa.array(ent_ends - ent_starts),
            "longest_streak": pa.array(longest)})

    out = parted.map_batches(kernel, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return out.sort_values(entity_col).reset_index(drop=True)


def peak_concurrency_by_key(ds, key_col: str = "event_type",
                            ts_col: str = "ts",
                            dur_us: int = 1_800_000_000
                            ) -> pd.DataFrame:
    """Peak concurrency — the sweep-line maximum-overlap statistic: each
    event opens a half-open interval [ts, ts + dur) and, per key, the
    answer is the maximum number of simultaneously open intervals (the
    capacity-planning number of a sessionized workload).

    Half-open semantics fix the tie rule: at equal timestamps the −1
    (close) sweeps before the +1 (open), implemented as a (t, delta)
    sort in the kernel and the identical ORDER BY in the oracle's
    running-sum window — integer end to end.

    Scale shape: each event scatters exactly two narrow (key, t, ±1)
    rows inside ``map_batches``; ONE key exchange co-locates a key's
    sweep; the whole-block kernel is one lexsort + grouped cumsum-max
    (``np.maximum.reduceat`` over per-key segment maxima of the running
    sum). → pandas (key, n_events, peak) sorted."""
    from .partition import hash_partitioned

    def scatter(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        return pa.table({
            key_col: pa.array(np.r_[k, k], pa.string()),
            "t": pa.array(np.r_[ts, ts + dur_us]),
            "delta": pa.array(np.r_[np.ones(len(ts), np.int64),
                                    -np.ones(len(ts), np.int64)])})

    parted = hash_partitioned(
        ds.map_batches(scatter, batch_format="pyarrow"), [key_col])
    cols = [key_col, "n_events", "peak"]
    if parted is None:
        return pd.DataFrame(columns=cols)

    out_schema = pa.schema([pa.field(key_col, pa.string()),
                            pa.field("n_events", pa.int64()),
                            pa.field("peak", pa.int64())])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        k = t[key_col].to_numpy(zero_copy_only=False)
        tt = np.asarray(t["t"], np.int64)
        d = np.asarray(t["delta"], np.int64)
        order = np.lexsort((d, tt, k))          # close before open
        k, d = k[order], d[order]
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        run = np.cumsum(d)
        # rebase each key's running sum: subtract the cumsum just
        # before the segment start (zero by construction per key, but
        # the global cumsum carries prior keys' totals)
        base = np.where(starts > 0, run[starts - 1], 0)
        seg = np.cumsum(new) - 1
        run = run - base[seg]
        peak = np.maximum.reduceat(run, starts)
        n = np.diff(np.r_[starts, len(k)]) // 2
        return pa.table({key_col: pa.array(k[starts], pa.string()),
                         "n_events": pa.array(n),
                         "peak": pa.array(peak)})

    out = parted.map_batches(kernel, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return out.sort_values(key_col).reset_index(drop=True)


def rolling_active_entities(ds, window_bins: int = 7,
                            entity_col: str = "user_id",
                            ts_col: str = "ts",
                            bin_us: int = 86_400_000_000
                            ) -> pd.DataFrame:
    """Rolling distinct-active count — WAU-style: for every day in the
    data range, the number of DISTINCT entities active in the trailing
    ``window_bins``-day window. Distinct-over-window is not additive,
    so the exact plan scatters each (entity, day) presence row to the
    ``window_bins`` report-days it contributes to and dedups by
    (entity, report_day) — shuffle volume W×|presence| narrow integer
    rows, the standard exact shape (sketch the window with HLL past
    that, the ``hll_distinct_by_type`` seam).

    Scale: per-block DISTINCT presence partials → (entity, day)
    groupby dedup → W-day scatter (clipped to the data range, an O(1)
    driver reduce) → (entity, report_day) groupby dedup →
    O(days) count groupby. Integer end to end.

    → pandas (day, n_active) for every day in [min_day, max_day]."""
    from ray.data.aggregate import Count

    from .partition import drop_empty_blocks

    def pres_partial(t: pa.Table) -> pa.Table:
        u = np.asarray(t[entity_col], np.int64)
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        df = pd.DataFrame({"e": u, "b": ts // bin_us}).drop_duplicates()
        return pa.table({"e": pa.array(df["e"], pa.int64()),
                         "b": pa.array(df["b"], pa.int64())})

    pres = (ds.map_batches(pres_partial, batch_format="pyarrow")
            .groupby(["e", "b"])
            .aggregate(Count(alias_name="_c"))
            .select_columns(["e", "b"])
            .materialize())           # PIN: range reduce + scatter

    rng = pres.map_batches(
        lambda t: pa.table({"d0": [int(np.asarray(t["b"]).min())],
                            "d1": [int(np.asarray(t["b"]).max())]}),
        batch_format="pyarrow").to_pandas()
    if rng.empty:
        return pd.DataFrame(columns=["day", "n_active"])
    d0, d1 = int(rng["d0"].min()), int(rng["d1"].max())

    def scatter(t: pa.Table) -> pa.Table:
        e = np.asarray(t["e"], np.int64)
        b = np.asarray(t["b"], np.int64)
        outs = []
        for w in range(window_bins):
            wd = b + w
            keep = wd <= d1
            outs.append(pa.table({"e": pa.array(e[keep]),
                                  "wd": pa.array(wd[keep])}))
        return pa.concat_tables(outs)

    clean = drop_empty_blocks(
        pres.map_batches(scatter, batch_format="pyarrow"))
    if clean is None:
        return pd.DataFrame(columns=["day", "n_active"])
    out = (clean.groupby(["e", "wd"])
           .aggregate(Count(alias_name="_c"))
           .select_columns(["e", "wd"])
           .groupby("wd")
           .aggregate(Count(alias_name="n_active"))
           .to_pandas())
    out = out.rename(columns={"wd": "day"})
    return out.sort_values("day").reset_index(drop=True)
