"""convoy_pairs — brute-force differential on synthetic tracks with
planted convoys (co-moving pairs across CHANGING cells), random
meeters, and bucket gaps; plus boundary cases for min_len.
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cartwright_ray.joins.crossing_join import convoy_pairs

H = 3_600_000_000  # 1 h in µs


def _brute(df, min_len):
    pres = set()
    for r in df.itertuples():
        pres.add((r.user_id, r.x // 8, r.y // 8, r.ts_us // H))
    by_slot = {}
    for (u, cx, cy, b) in pres:
        by_slot.setdefault((cx, cy, b), set()).add(u)
    buckets = {}
    for (cx, cy, b), us in by_slot.items():
        for a, c in itertools.combinations(sorted(us), 2):
            buckets.setdefault((a, c), set()).add(b)
    rows = []
    for (a, c), bs in buckets.items():
        bs = sorted(bs)
        best = run = 1
        for p, q in zip(bs, bs[1:]):
            run = run + 1 if q == p + 1 else 1
            best = max(best, run)
        if best >= min_len:
            rows.append((a, c, best, len(bs)))
    return (pd.DataFrame(rows, columns=["user_a", "user_b", "max_run",
                                        "n_buckets"])
            .sort_values(["user_a", "user_b"]).reset_index(drop=True))


def _mk_points(rng, n_users=24, n_hours=30):
    rows = []
    for u in range(n_users):
        # base walk; users u and u+1 for even u co-move during a
        # planted window of random length
        bx, by = int(rng.integers(-40, 40)), int(rng.integers(-40, 40))
        for h in range(n_hours):
            if rng.random() < 0.25:
                continue  # gap hours
            x = bx + int(rng.integers(0, 6)) + h        # drifting cell
            y = by + int(rng.integers(0, 6))
            rows.append((u, h * H + int(rng.integers(0, H)), x, y))
    # planted convoys: pair (0,1) 5 consecutive hours moving cells,
    # pair (2,3) exactly 3, pair (4,5) only 2 (below default min_len)
    for (a, b, start, ln) in [(0, 1, 3, 5), (2, 3, 10, 3), (4, 5, 20, 2)]:
        for k in range(ln):
            cellx, celly = 100 + 8 * k, -64   # cell changes every hour
            for u in (a, b):
                rows.append((u, (start + k) * H + 7, cellx, celly))
    return pd.DataFrame(rows, columns=["user_id", "ts_us", "x", "y"])


def _run(df, min_len):
    t = pa.table({"user_id": pa.array(df.user_id.to_numpy(np.int64)),
                  "event_id": pa.array(np.arange(len(df), dtype=np.int64)),
                  "ts": pa.array(df.ts_us.to_numpy(np.int64)).cast(
                      pa.timestamp("us")),
                  "x": pa.array(df.x.to_numpy(np.int64)),
                  "y": pa.array(df.y.to_numpy(np.int64))})
    ds = ray.data.from_arrow(t).repartition(5)
    res = convoy_pairs(ds, min_len=min_len)
    if res is None:
        return pd.DataFrame(columns=["user_a", "user_b", "max_run",
                                     "n_buckets"])
    return (res.to_pandas().sort_values(["user_a", "user_b"])
            .reset_index(drop=True))


def test_planted_convoys(ray_session):
    rng = np.random.default_rng(11)
    df = _mk_points(rng)
    got = _run(df, 3)
    exp = _brute(df, 3)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the planted pairs are present with at least the planted run
    gm = got.set_index(["user_a", "user_b"])["max_run"]
    assert gm.loc[(0, 1)] >= 5 and gm.loc[(2, 3)] >= 3
    assert (4, 5) not in gm.index or gm.loc[(4, 5)] >= 3


def test_min_len_one_equals_all_pairs(ray_session):
    rng = np.random.default_rng(5)
    df = _mk_points(rng, n_users=12, n_hours=12)
    for min_len in (1, 2, 4):
        pd.testing.assert_frame_equal(_run(df, min_len),
                                      _brute(df, min_len),
                                      check_dtype=False)


def test_empty_and_singleton(ray_session):
    df = pd.DataFrame({"user_id": [1], "ts_us": [5], "x": [0], "y": [0]})
    got = _run(df, 2)
    assert got.empty
