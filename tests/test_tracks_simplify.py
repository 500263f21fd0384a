"""simplify_tracks — Douglas–Peucker trajectory reduction.

Brute-force recursive reference per track, multi-block inputs, plus the
geometry edge cases: collinear runs collapse to endpoints, zero-length
chords (stationary pings) use point distance, ties split at the
smallest index, and 1-/2-point tracks survive unchanged.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.tracks import (douglas_peucker_keep,
                                          simplify_tracks)


def _brute_keep(x, y, eps):
    n = len(x)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j - i < 2:
            return
        ax, ay, dx, dy = x[i], y[i], x[j] - x[i], y[j] - y[i]
        len2 = dx * dx + dy * dy
        best, bm = -1.0, -1
        for p in range(i + 1, j):
            px, py = x[p] - ax, y[p] - ay
            if len2 == 0.0:
                m = px * px + py * py
            else:
                c = dx * py - dy * px
                m = c * c
            if m > best:
                best, bm = m, p
        thresh = eps * eps * (len2 if len2 > 0.0 else 1.0)
        if best > thresh:
            keep[bm] = True
            rec(i, bm)
            rec(bm, j)

    rec(0, n - 1)
    return np.array(keep)


def _run(df, eps, blocks=5):
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = simplify_tracks(ds, eps=eps).to_pandas()
    return out.sort_values(["user_id", "seq"]).reset_index(drop=True)


def test_matches_brute_force_random_walks():
    rng = np.random.default_rng(23)
    rows = []
    for uid in range(12):
        n = int(rng.integers(1, 60))
        lat = np.cumsum(rng.normal(0, 1.0, n)) + uid
        lon = np.cumsum(rng.normal(0, 1.0, n)) - uid
        for s in range(n):
            rows.append({"user_id": uid, "ts": s * 10 + int(uid),
                         "event_id": 1000 * uid + s,
                         "lat": lat[s], "lon": lon[s]})
    df = pd.DataFrame(rows)
    got = _run(df, eps=1.5)
    want_rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        keep = _brute_keep(g.lat.to_numpy(), g.lon.to_numpy(), 1.5)
        for s in np.flatnonzero(keep):
            want_rows.append({"user_id": uid, "seq": int(s),
                              "event_id": int(g.event_id[s]),
                              "lat": g.lat[s], "lon": g.lon[s]})
    want = pd.DataFrame(want_rows)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert len(got) < len(df)                # it actually simplified


def test_collinear_collapses_to_endpoints():
    df = pd.DataFrame({"user_id": 1, "ts": range(10),
                       "event_id": range(10),
                       "lat": np.linspace(0, 9, 10),
                       "lon": np.linspace(0, 18, 10)})
    got = _run(df, eps=0.01, blocks=2)
    assert list(got["seq"]) == [0, 9]


def test_stationary_track_zero_length_chord():
    # all pings identical except one excursion: the zero-length chord
    # branch must fire and keep the excursion
    df = pd.DataFrame({"user_id": 2, "ts": range(5),
                       "event_id": range(5),
                       "lat": [3.0, 3.0, 8.0, 3.0, 3.0],
                       "lon": [4.0, 4.0, 4.0, 4.0, 4.0]})
    got = _run(df, eps=1.0, blocks=2)
    assert list(got["seq"]) == [0, 2, 4]


def test_tiny_tracks_survive():
    df = pd.DataFrame({"user_id": [7, 8, 8], "ts": [0, 0, 1],
                       "event_id": [1, 2, 3],
                       "lat": [1.0, 2.0, 3.0], "lon": [1.0, 2.0, 3.0]})
    got = _run(df, eps=5.0, blocks=2)
    assert len(got) == 3                      # endpoints always kept


def test_tie_splits_at_smallest_index():
    # two interior points at identical max distance: index 1 must win
    x = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 1.0, -1.0, 0.0])
    keep = douglas_peucker_keep(x, y, eps=0.5)
    assert keep.tolist() == [True, True, True, True]
    keep2 = douglas_peucker_keep(x, y, eps=1.5)
    assert keep2.tolist() == [True, False, False, True]


def test_resample_tracks_matches_brute():
    """Hourly lerp vs a per-epoch Python loop, incl. duplicate-ts
    pings (empty intervals skipped, last duplicate wins as the left
    bracket) and a track shorter than one step (no output)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from cartwright_ray.stages.tracks import resample_tracks

    H = 3_600_000_000
    rng = np.random.default_rng(103)
    rows = []
    eid = 0
    for u in range(6):
        n = rng.integers(2, 40)
        ts = np.sort(rng.integers(0, 30 * H, n))
        if u == 3:
            ts[1] = ts[0]                       # duplicate timestamp
        if u == 5:
            ts = ts[:2]; ts[1] = ts[0] + 100    # sub-step track
        for k in range(len(ts)):
            rows.append((u, eid, ts[k], rng.uniform(-50, 50),
                         rng.uniform(-100, 100)))
            eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us",
                                     "lat", "lon"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")

    want = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        ts = g["ts_us"].to_numpy(np.int64)
        la = g["lat"].to_numpy()
        lo = g["lon"].to_numpy()
        for h in range((int(ts[0]) + H - 1) // H,
                       (int(ts[-1]) - 1) // H + 1):
            q = h * H
            i = int(np.searchsorted(ts, q, side="right")) - 1
            f = float(q - ts[i]) / float(ts[i + 1] - ts[i])
            want.append((u, h, la[i] + (la[i + 1] - la[i]) * f,
                         lo[i] + (lo[i + 1] - lo[i]) * f))
    want = pd.DataFrame(want, columns=["user_id", "h", "lat", "lon"])
    assert len(want) > 50
    for blocks in (1, 4):
        ds = ray.data.from_pandas(
            df[["user_id", "event_id", "ts", "lat", "lon"]]
        ).repartition(blocks)
        got = (resample_tracks(ds).to_pandas()
               .sort_values(["user_id", "h"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert not (want["user_id"] == 5).any()     # sub-step: nothing
