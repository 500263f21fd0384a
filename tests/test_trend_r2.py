"""trend_r2_by_key — brute lstsq differential + perfect/zero-fit
invariants."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.trend import trend_r2_by_key


def test_matches_brute_and_extremes():
    rng = np.random.default_rng(83)
    rows = []
    base = np.datetime64("2024-01-01", "us")
    for k, (slope, noise) in {"lin": (3.0, 0.0), "noisy": (1.0, 40.0),
                              "flat": (0.0, 0.0)}.items():
        for i in range(200):
            v = 100.0 + slope * i + rng.normal(0, noise)
            rows.append((k, base + np.timedelta64(i * 3600, "s"),
                         round(v, 2)))
    df = pd.DataFrame(rows, columns=["event_type", "ts", "value"])

    runs = [trend_r2_by_key(ray.data.from_pandas(df).repartition(b))
            for b in (1, 5)]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    got = runs[0].set_index("event_type")

    for k, g in df.groupby("event_type"):
        x = (g["ts"].astype("int64").to_numpy() // 1000
             // 3_600_000_000 - 438_288)
        y = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(x)
        # Python ints: the engine combines in arbitrary precision and
        # num² overflows int64 here
        sxy = int((x * y).sum())
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        want_r2 = (float(num) * float(num)) \
            / (float(dx) * float(dy)) if dx and dy else 0.0
        assert abs(got.loc[k, "r2"] - want_r2) < 1e-9

    assert got.loc["lin", "r2"] > 0.999999
    assert got.loc["flat", "r2"] == 0.0
    assert 0.0 < got.loc["noisy", "r2"] < 1.0
    assert abs(got.loc["lin", "slope"] - 3.0) < 1e-6


def test_percentile_rank_matches_pandas():
    from cartwright_ray.stages.normalize import percentile_rank_by_key

    rng = np.random.default_rng(91)
    n = 800
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "event_type": rng.choice(list("pq"), n),
        "value": np.round(rng.normal(size=n), 3)})

    want_rows = []
    for k, g in df.groupby("event_type"):
        g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
        m = len(g)
        for r, (_, row) in enumerate(g.iterrows(), start=1):
            want_rows.append((row.event_id, k, row.value, r,
                              (r - 1) / (m - 1) if m > 1 else 0.0))
    want = pd.DataFrame(want_rows, columns=["event_id", "event_type",
                                            "value", "rank", "pr"]) \
        .sort_values(["event_type", "rank"]).reset_index(drop=True)

    for blocks in (1, 5):
        got = percentile_rank_by_key(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.groupby("event_type")["pr"].max().eq(1.0).all()


def test_rolling_anomaly_flags_planted_spike():
    from cartwright_ray.stages.trend import rolling_anomaly_by_key

    rows = []
    base = np.datetime64("2024-03-01", "us")
    for d in range(30):
        n = 5 if d != 20 else 80          # planted spike day 20
        for i in range(n):
            rows.append(("s", base + np.timedelta64(d * 86400 + i,
                                                    "s")))
    df = pd.DataFrame(rows, columns=["event_type", "ts"])

    runs = [rolling_anomaly_by_key(ray.data.from_pandas(df)
                                   .repartition(b)) for b in (1, 4)]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    got = runs[0]
    d0 = int(got["day"].min())

    flagged = set(got[got.is_anomaly == 1]["day"] - d0)
    assert 20 in flagged
    # steady-state days are not flagged
    assert not ({5, 6, 7, 10, 15} & flagged)
    # brute replay of one mid-series window
    row = got[(got.day - d0) == 15].iloc[0]
    window = [5] * 7
    mu = sum(window) / 7
    assert abs(row.mu - mu) < 1e-12 and row.w == 7


def test_ewma_exact_dyadic_recurrence():
    from cartwright_ray.stages.trend import ewma_daily_by_key

    rng = np.random.default_rng(97)
    rows = []
    base = np.datetime64("2024-05-01", "us")
    counts = {d: int(rng.integers(0, 50)) for d in range(25)}
    for d, n in counts.items():
        for i in range(n):
            rows.append(("e", base + np.timedelta64(d * 86400 + i,
                                                    "s")))
    df = pd.DataFrame(rows, columns=["event_type", "ts"])

    runs = [ewma_daily_by_key(ray.data.from_pandas(df)
                              .repartition(b)) for b in (1, 4)]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    got = runs[0]

    # brute recurrence — must be BIT-exact (dyadic arithmetic).
    # d0 is the first day WITH events (zero-count leading days are
    # outside the dense range), so rebase counts onto it.
    d0 = int(got.day.min())
    base_day = int(np.datetime64("2024-05-01").astype(
        "datetime64[D]").astype(int))
    off = d0 - base_day
    acc = 0.0
    for _, r in got.iterrows():
        acc = (acc + counts.get(int(r.day) - base_day, 0)) / 2.0
        assert r.ewma == acc
    # ... and equal to the explicit weighted sum in any order
    present = sorted(int(d) for d in got.day)
    for t in present[::7]:
        want = sum(counts.get(j - base_day, 0) * 0.5 ** (t - j + 1)
                   for j in range(d0, t + 1))
        assert float(got[got.day == t]["ewma"].iloc[0]) == want
