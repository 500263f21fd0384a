"""semivariogram — brute-force differential (all-pairs in Python) on
clustered integer points; bin boundaries, identical-coordinate pairs,
and the even-sum halving are all exercised.
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cartwright_ray.stages.hotspot import semivariogram


def _brute(df, bin_w, n_bins):
    rows = {}
    pts = list(df.itertuples())
    for a, b in itertools.combinations(pts, 2):
        d2 = (a.x - b.x) ** 2 + (a.y - b.y) ** 2
        if d2 >= (n_bins * bin_w) ** 2:
            continue
        k = 0
        while (k + 1) ** 2 * bin_w ** 2 <= d2:
            k += 1
        cnt, s = rows.get(k, (0, 0))
        rows[k] = (cnt + 1, s + (a.v - b.v) ** 2)
    out = [(k * bin_w, (k + 1) * bin_w, c, float(s) / (2.0 * float(c)))
           for k, (c, s) in sorted(rows.items())]
    return pd.DataFrame(out, columns=["h_lo", "h_hi", "n_pairs",
                                      "gamma"])


def _run(df, bin_w, n_bins):
    t = pa.table({"event_id": pa.array(np.arange(len(df), dtype=np.int64)),
                  "x": pa.array(df.x.to_numpy(np.int64)),
                  "y": pa.array(df.y.to_numpy(np.int64)),
                  "v": pa.array(df.v.to_numpy(np.int64))})
    ds = ray.data.from_arrow(t).repartition(4)
    return semivariogram(ds, bin_w=bin_w, n_bins=n_bins) \
        .reset_index(drop=True)


def _mk(rng, n=300):
    # clustered points spanning several cells, including exact
    # duplicates (d2 = 0 pairs land in bin 0)
    x = rng.integers(-20, 20, n) + rng.integers(0, 3, n)
    y = rng.integers(-20, 20, n)
    v = rng.integers(0, 97, n)
    df = pd.DataFrame({"x": x, "y": y, "v": v})
    return pd.concat([df, df.head(5)], ignore_index=True)


def test_matches_brute(ray_session):
    rng = np.random.default_rng(19)
    df = _mk(rng)
    got = _run(df, 2, 4)
    exp = _brute(df, 2, 4)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_other_binning(ray_session):
    rng = np.random.default_rng(23)
    df = _mk(rng, n=150)
    got = _run(df, 4, 2)
    exp = _brute(df, 4, 2)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_empty_and_tiny(ray_session):
    df = pd.DataFrame({"x": [0], "y": [0], "v": [5]})
    got = _run(df, 2, 4)
    assert got.empty
