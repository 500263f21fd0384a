"""Interval (range) join + sliding-window aggregate vs brute-force oracles."""

import numpy as np
import pandas as pd
import pytest

from cartwright_ray.pipelines.relational import interval_join


@pytest.fixture(scope="module")
def event_frame():
    rng = np.random.default_rng(21)
    n = 2000
    ts_us = np.sort(rng.integers(0, 10_000_000_000, n))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n),
        "ts": ts_us.astype("datetime64[us]"),
        "value": rng.uniform(-5, 5, n),
    })


def test_interval_join_exact(ray_session, event_frame):
    import ray.data
    rng = np.random.default_rng(22)
    m = 60
    start = np.sort(rng.integers(0, 9_500_000_000, m))
    width = rng.integers(1, 800_000_000, m)       # variable widths
    intervals = {"interval_id": np.arange(m, dtype=np.int64),
                 "start_us": start, "end_us": start + width}
    ds = ray.data.from_pandas(event_frame).repartition(6)
    out = interval_join(ds, intervals).to_pandas()
    ts = event_frame["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    want = sorted(
        (int(e), int(j))
        for i, e in enumerate(event_frame["event_id"])
        for j in range(m)
        if intervals["start_us"][j] <= ts[i] < intervals["end_us"][j])
    got = sorted(zip(out["event_id"].astype(int), out["interval_id"].astype(int)))
    assert got == want
    assert len(got)


def test_interval_join_empty_and_boundary(ray_session):
    import ray.data
    df = pd.DataFrame({"event_id": [0, 1, 2],
                       "ts": np.array([100, 200, 300], dtype="datetime64[us]")})
    iv = {"interval_id": np.array([7]), "start_us": np.array([200]),
          "end_us": np.array([300])}
    out = interval_join(ray.data.from_pandas(df), iv).to_pandas()
    # half-open [start, end): ts=200 in, ts=300 out
    assert list(out["event_id"]) == [1]


def test_sliding_window_counts_exact(ray_session, event_frame, tmp_path):
    import ray.data

    from cartwright_ray.pipelines.relational import sliding_window_user_counts
    p = tmp_path / "events.parquet"
    event_frame.to_parquet(p)
    out = sliding_window_user_counts(str(tmp_path))
    ts = event_frame["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    cents = np.floor(event_frame["value"].to_numpy() * 100).astype(np.int64)
    uid = event_frame["user_id"].to_numpy()
    win = 3600 * 1_000_000
    for _, r in out.sample(80, random_state=5).iterrows():
        i = int(r["event_id"])
        mask = (uid == uid[i]) & (ts >= ts[i] - win) & (ts <= ts[i])
        assert int(r["window_n"]) == int(mask.sum())
        assert int(r["window_cents"]) == int(cents[mask].sum())


def test_sketch_quantiles_matches_brute(ray_session, tmp_path):
    import numpy as np

    from cartwright_ray.pipelines.relational import (SKETCH_BIN_W,
                                                     SKETCH_NBINS,
                                                     sketch_quantiles_by_type)
    rng = np.random.default_rng(31)
    n = 5000
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.uniform(0, 600, n).round(2),
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = sketch_quantiles_by_type(str(tmp_path))
    for et in ("a", "b", "c"):
        vals = np.sort(df[df["event_type"] == et]["value"].to_numpy())
        bins = np.clip(np.floor(vals / SKETCH_BIN_W), 0,
                       SKETCH_NBINS - 1).astype(int)
        total = len(vals)
        for label, qn, qd in (("p50", 1, 2), ("p90", 9, 10),
                              ("p99", 99, 100)):
            rank = (total * qn + qd - 1) // qd
            want_bin = int(bins[rank - 1])      # bin of the rank-th value
            row = out[(out["event_type"] == et) & (out["q"] == label)]
            assert int(row["bin_idx"].iloc[0]) == want_bin
            assert int(row["cum_below"].iloc[0]) == int((bins < want_bin).sum())
            # approx within one bin width of the exact quantile value
            assert abs(float(row["approx_value"].iloc[0])
                       - vals[rank - 1]) <= SKETCH_BIN_W


def test_track_segments_brute(ray_session, tmp_path):
    import numpy as np

    from cartwright_ray.geo.haversine import haversine_km
    from cartwright_ray.pipelines.relational import track_segments
    rng = np.random.default_rng(41)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.sort(rng.integers(0, 10**12, n)).astype("datetime64[us]"),
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = track_segments(str(tmp_path))
    # brute-force per user
    for uid in range(0, 20, 7):
        sub = df[df["user_id"] == uid].sort_values(["ts", "event_id"])
        e = sub["event_id"].to_numpy()
        u = sub["user_id"].to_numpy()
        lat = ((u * 13 % 120) - 60.0 + (e * 7 % 19) * 0.125
               + np.where(e % 11 == 0, 15.0, 0.0))
        lon = (u * 29 % 300) - 150.0 + (e * 3 % 23) * 0.125
        d = haversine_km(lat[:-1], lon[:-1], lat[1:], lon[1:])
        want = np.concatenate(([0], np.cumsum(d > 800.0))).astype(int)
        got = out[out["user_id"] == uid].sort_values("event_id")
        got = got.set_index("event_id").loc[e]["segment_id"].to_numpy()
        assert (got == want).all()
    assert out["segment_id"].max() > 0


def test_rollup_counts_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cartwright_ray.pipelines.relational import rollup_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], 2000),
                       "b": rng.choice(["p", "q"], 2000)})
    out = rollup_counts(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(5), ["a", "b"]).to_pandas()
    # full level
    full = df.groupby(["a", "b"]).size()
    for (a, b), n in full.items():
        assert out[(out.a == a) & (out.b == b)].n.item() == n
    # prefix level
    pre = df.groupby("a").size()
    for a, n in pre.items():
        assert out[(out.a == a) & (out.b == "__all__")].n.item() == n
    # grand total
    assert out[(out.a == "__all__") & (out.b == "__all__")].n.item() == 2000
    assert len(out) == len(full) + len(pre) + 1


@pytest.mark.parametrize("fplan", [{}, {"small_limit": 0}])
def test_funnel_counts_matches_brute_force(ray_session, fplan):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cartwright_ray.pipelines.relational import funnel_counts

    rng = np.random.default_rng(29)
    n = 6000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 300, n),
        "event_type": rng.choice(["view", "click", "purchase", "other"],
                                 n, p=[0.4, 0.3, 0.1, 0.2]),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
    })
    stages = ["view", "click", "purchase"]
    out = funnel_counts(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(7), stages, **fplan).to_pandas()

    # brute force, incl. the late-start case the K-truncation design
    # failed on (winner deep in a later stage's timestamp order)
    want = np.zeros(3, int)
    for _, g in df.groupby("user_id"):
        cur = pd.Timestamp.min
        for i, s in enumerate(stages):
            cand = g[(g.event_type == s) & (g.ts > cur)]
            if cand.empty:
                break
            cur = cand.ts.min()
            want[i] += 1
    assert dict(zip(out["stage"], out["n_users"])) == dict(
        zip(stages, want.tolist()))
    assert (np.diff(out["n_users"].to_numpy()) <= 0).all()  # monotone


@pytest.mark.parametrize("fplan", [{}, {"small_limit": 0}])
def test_funnel_counts_empty_input(ray_session, fplan):
    """No funnel-typed rows at all → all-zero counts, not an Arrow
    length-mismatch crash (ADVICE r03: the empty small path skipped the
    resolve UDF and paired a len-K stage array with a 0-length agg)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cartwright_ray.pipelines.relational import funnel_counts

    df = pd.DataFrame({
        "user_id": [1, 2, 3],
        "event_type": ["other", "other", "misc"],
        "ts": pd.to_datetime([1, 2, 3], unit="s"),
    })
    stages = ["view", "click", "purchase"]
    out = funnel_counts(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(2), stages, **fplan).to_pandas()
    assert list(out["stage"]) == stages
    assert list(out["n_users"]) == [0, 0, 0]


def test_mode_per_key_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cartwright_ray.pipelines.relational import mode_per_key

    rng = np.random.default_rng(41)
    df = pd.DataFrame({"k": rng.integers(0, 120, 5000),
                       "v": rng.choice(["a", "b", "c", "d"], 5000)})
    out = mode_per_key(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(6), "k", "v").to_pandas().sort_values("k") \
        .reset_index(drop=True)
    cnt = df.groupby(["k", "v"], as_index=False).size()
    cnt = cnt.sort_values(["k", "size", "v"],
                          ascending=[True, False, True])
    want = cnt.drop_duplicates("k", keep="first").reset_index(drop=True)
    assert out["mode_value"].tolist() == want["v"].tolist()
    assert out["n"].tolist() == want["size"].tolist()
