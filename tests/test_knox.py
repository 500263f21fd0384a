"""knox_statistic — brute-force all-pairs differential with planted
space-time clusters, boundary distances/times, and the ratio formula.
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cartwright_ray.stages.hotspot import knox_statistic

H = 3_600_000_000


def _brute(df, s, tau):
    st = sp = tp = 0
    for a, b in itertools.combinations(list(df.itertuples()), 2):
        near = (a.x - b.x) ** 2 + (a.y - b.y) ** 2 <= s * s
        close = abs(a.t - b.t) <= tau
        sp += near
        tp += close
        st += near and close
    n = len(df)
    ratio = (float(st) * float(n * (n - 1) // 2)
             / (float(sp) * float(tp))) if sp and tp else float("nan")
    return n, st, sp, tp, ratio


def _run(df, s, tau):
    t = pa.table({"event_id": pa.array(np.arange(len(df), dtype=np.int64)),
                  "x": pa.array(df.x.to_numpy(np.int64)),
                  "y": pa.array(df.y.to_numpy(np.int64)),
                  "ts": pa.array(df.t.to_numpy(np.int64)).cast(
                      pa.timestamp("us"))})
    ds = ray.data.from_arrow(t).repartition(4)
    return knox_statistic(ds, s=s, tau_us=tau)


def test_matches_brute(ray_session):
    rng = np.random.default_rng(47)
    n = 250
    df = pd.DataFrame({
        "x": rng.integers(-30, 30, n),
        "y": rng.integers(-30, 30, n),
        "t": rng.integers(0, 20 * H, n)})
    # planted space-time cluster: 10 points within s and tau of each
    # other, plus exact-boundary pairs (d2 == s2, |dt| == tau)
    extra = pd.DataFrame({
        "x": [100] * 10 + [0, 4], "y": [100] * 10 + [0, 0],
        "t": [50 * H + i for i in range(10)] + [0, H]})
    df = pd.concat([df, extra], ignore_index=True)
    got = _run(df, 4, H)
    n_, st, sp, tp, ratio = _brute(df, 4, H)
    row = got.iloc[0]
    assert (int(row.n_points), int(row.n_pairs_st), int(row.n_pairs_s),
            int(row.n_pairs_t)) == (n_, st, sp, tp)
    assert row.knox_ratio == ratio


def test_tiny(ray_session):
    df = pd.DataFrame({"x": [0], "y": [0], "t": [0]})
    assert _run(df, 4, H).empty
