"""dwell_episodes — brute-force differential + layout invariance.

The brute oracle walks each track in (ts, event_id) order with a plain
Python loop, closing a run whenever the 1° cell changes; the
distributed sort-exchange kernel must match it exactly at any block
layout. Edge cases: a run spanning the whole track, min_pings
boundaries (exactly 3), ties on ts resolved by event_id, and a track
that never dwells.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.tracks import dwell_episodes


def _brute(df, min_pings=3):
    rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cx = np.floor(g["lon"].to_numpy()).astype(np.int64)
        cy = np.floor(g["lat"].to_numpy()).astype(np.int64)
        e = g["event_id"].to_numpy()
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        i = 0
        while i < len(e):
            j = i
            while j + 1 < len(e) and cx[j + 1] == cx[i] \
                    and cy[j + 1] == cy[i]:
                j += 1
            if j - i + 1 >= min_pings:
                rows.append((u, cx[i], cy[i], e[i], e[j], j - i + 1,
                             ts[j] - ts[i]))
            i = j + 1
    return (pd.DataFrame(rows, columns=[
        "user_id", "cx", "cy", "start_event", "end_event", "n_pings",
        "duration_us"]).sort_values(["user_id", "start_event"])
        .reset_index(drop=True))


def test_matches_brute_and_layout_invariant():
    rng = np.random.default_rng(23)
    n = 1200
    # sticky walk IN TIME ORDER: each user's cell persists from the
    # previous ping with p=0.72, so multi-ping dwells are common
    u = np.sort(rng.integers(0, 10, n)).astype(np.int64)
    ts_h = np.empty(n, np.int64)
    cell = np.empty((n, 2), np.int64)
    for uid in np.unique(u):
        idx = np.flatnonzero(u == uid)
        ts_h[idx] = np.cumsum(rng.integers(0, 3, len(idx)))  # ties too
        c = np.empty((len(idx), 2), np.int64)
        c[0] = rng.integers(0, 6, 2)
        for k in range(1, len(idx)):
            c[k] = c[k - 1] if rng.random() < 0.72 \
                else rng.integers(0, 6, 2)
        cell[idx] = c
    perm = rng.permutation(n)                    # shuffle row layout
    df = pd.DataFrame({
        "user_id": u, "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts_h * 3_600_000_000, unit="us"),
        "lat": cell[:, 0] + rng.uniform(0.05, 0.95, n),
        "lon": cell[:, 1] + rng.uniform(0.05, 0.95, n)}).iloc[perm]
    want = _brute(df)
    assert len(want) > 10
    for blocks in (1, 5, 21):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (dwell_episodes(ds).to_pandas()
               .sort_values(["user_id", "start_event"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_boundaries_and_full_track_run():
    ts = pd.to_datetime(np.arange(9) * 1_000_000, unit="us")
    df = pd.DataFrame({
        # u0: one full-track 4-ping dwell; u1: exactly 3 then hop then 2
        "user_id": np.array([0, 0, 0, 0, 1, 1, 1, 1, 1], np.int64),
        "event_id": np.arange(9, dtype=np.int64),
        "ts": ts,
        "lat": [5.1, 5.2, 5.9, 5.5, 2.1, 2.5, 2.9, 7.0, 7.1],
        "lon": [5.1, 5.8, 5.2, 5.3, 3.1, 3.9, 3.2, 8.0, 8.9]})
    got = (dwell_episodes(ray.data.from_pandas(df)).to_pandas()
           .sort_values(["user_id", "start_event"])
           .reset_index(drop=True))
    want = _brute(df)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) == 2
    assert want.loc[0, "n_pings"] == 4 and want.loc[1, "n_pings"] == 3
    assert want.loc[0, "duration_us"] == 3_000_000
