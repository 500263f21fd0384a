"""gap_quantiles_by_key — brute order-statistic differential."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.gaps import gap_quantiles_by_key


def test_matches_brute_rank_pick():
    rng = np.random.default_rng(27)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "event_type": rng.choice(list("xyz"), n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n)})

    gaps = {}
    for (u, k), g in df.groupby(["user_id", "event_type"]):
        ts = g.sort_values(["ts", "event_id"])["ts"] \
            .astype("int64").to_numpy()  # ns
        for d in np.diff(ts) // 1000:    # µs
            gaps.setdefault(k, []).append(int(d))
    rows = []
    for k in sorted(gaps):
        g = np.sort(gaps[k])
        nn = len(g)
        pick = lambda p: int(g[(nn * p + 99) // 100 - 1])
        rows.append((k, nn, pick(50), pick(90), pick(99)))
    want = pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                       "p50_us", "p90_us", "p99_us"])

    for blocks in (1, 6):
        got = gap_quantiles_by_key(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # monotone and in-data invariants
    assert (want.p50_us <= want.p90_us).all()
    assert (want.p90_us <= want.p99_us).all()


def test_single_event_users_produce_no_gaps():
    df = pd.DataFrame({
        "user_id": [1, 2, 3],
        "event_type": ["a", "a", "a"],
        "ts": pd.to_datetime([1, 2, 3], unit="s"),
        "event_id": [1, 2, 3]})
    got = gap_quantiles_by_key(ray.data.from_pandas(df))
    assert len(got) == 0


def test_longest_streak_matches_brute():
    from cartwright_ray.stages.gaps import longest_streak_by_entity

    rng = np.random.default_rng(33)
    rows = []
    for u in range(40):
        days = np.unique(rng.integers(0, 40,
                                      int(rng.integers(1, 30))))
        for d in days:
            # several events per day: dedup must collapse them
            for _ in range(int(rng.integers(1, 3))):
                rows.append((u, int(d) * 86400
                             + int(rng.integers(0, 86400))))
    df = pd.DataFrame(rows, columns=["user_id", "sec"])
    df["ts"] = pd.to_datetime(df["sec"], unit="s")

    def brute(days):
        days = np.unique(days)
        best = run = 1
        for i in range(1, len(days)):
            run = run + 1 if days[i] == days[i - 1] + 1 else 1
            best = max(best, run)
        return len(days), best

    want = []
    for u, g in df.groupby("user_id"):
        n, best = brute((g["sec"] // 86400).to_numpy())
        want.append((u, n, best))
    want = pd.DataFrame(want, columns=["user_id", "n_active_bins",
                                       "longest_streak"])

    for blocks in (1, 6):
        got = longest_streak_by_entity(
            ray.data.from_pandas(df[["user_id", "ts"]])
            .repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_peak_concurrency_matches_brute():
    from cartwright_ray.stages.gaps import peak_concurrency_by_key

    rng = np.random.default_rng(55)
    n = 1500
    dur = 1_800_000_000
    df = pd.DataFrame({
        "event_type": rng.choice(list("ab"), n),
        "ts": pd.to_datetime(rng.integers(0, 200_000, n), unit="s")})

    want_rows = []
    for k, g in df.groupby("event_type"):
        ts = (g["ts"].astype("int64") // 1000).to_numpy()  # µs
        ev = sorted([(t, 1) for t in ts] + [(t + dur, -1) for t in ts])
        run = best = 0
        for _, d in ev:
            run += d
            best = max(best, run)
        want_rows.append((k, len(g), best))
    want = pd.DataFrame(want_rows,
                        columns=["event_type", "n_events", "peak"])

    for blocks in (1, 6):
        got = peak_concurrency_by_key(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # tie rule: back-to-back intervals [0,30m) and [30m,60m) never
    # overlap (close sweeps before open)
    df2 = pd.DataFrame({
        "event_type": ["z", "z"],
        "ts": pd.to_datetime([0, 1800], unit="s")})
    got2 = peak_concurrency_by_key(ray.data.from_pandas(df2))
    assert int(got2["peak"].iloc[0]) == 1


def test_rolling_active_matches_brute():
    from cartwright_ray.stages.gaps import rolling_active_entities

    rng = np.random.default_rng(71)
    rows = []
    for u in range(60):
        for d in np.unique(rng.integers(0, 25,
                                        int(rng.integers(1, 12)))):
            rows.append((u, int(d) * 86400 + 7))
    df = pd.DataFrame(rows, columns=["user_id", "sec"])
    df["ts"] = pd.to_datetime(df["sec"], unit="s")

    pres = set(zip(df.user_id, df.sec // 86400))
    d0 = min(d for _, d in pres)
    d1 = max(d for _, d in pres)
    want = []
    for day in range(d0, d1 + 1):
        users = {u for u, d in pres if day - 6 <= d <= day}
        if users:
            want.append((day, len(users)))
    want = pd.DataFrame(want, columns=["day", "n_active"])

    for blocks in (1, 5):
        got = rolling_active_entities(
            ray.data.from_pandas(df[["user_id", "ts"]])
            .repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
