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
