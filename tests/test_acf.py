"""acf_by_key — numpy-brute differential, layout invariance, and the
seasonality invariant a period-p signal peaks at lag p."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.trend import acf_by_key


def _brute(days, nbins, lags):
    c = np.zeros(nbins, np.int64)
    np.add.at(c, days, 1)
    xbar = c.sum() / nbins
    den = ((c - xbar) ** 2).sum()
    out = {}
    for k in lags:
        if k >= nbins or den <= 0:
            out[k] = 0.0
        else:
            out[k] = ((c[:-k] - xbar) * (c[k:] - xbar)).sum() / den
    return out


def _mk_events(series: dict) -> pd.DataFrame:
    rows = []
    for key, days in series.items():
        for d in days:
            rows.append((key, np.datetime64("2024-01-01", "us")
                         + np.timedelta64(int(d) * 86400 + 3600, "s")))
    return pd.DataFrame(rows, columns=["event_type", "ts"])


def test_matches_brute_and_period_detection():
    rng = np.random.default_rng(3)
    nbins = 60
    # "weekly": bursts every 7 days; "noise": uniform; "quiet": one day
    weekly = np.concatenate([np.full(20, d)
                             for d in range(0, nbins, 7)])
    noise = rng.integers(0, nbins, 400)
    series = {"weekly": weekly, "noise": noise, "quiet": [5]}
    # force the global range to [0, nbins-1]
    series["noise"] = np.concatenate([noise, [0, nbins - 1]])
    df = _mk_events(series)

    lags = (1, 2, 3, 4, 5, 6, 7)
    runs = [acf_by_key(ray.data.from_pandas(df).repartition(b),
                       lags=lags) for b in (1, 5)]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    got = runs[0]
    assert (got["n_bins"] == nbins).all()

    for key, days in series.items():
        want = _brute(np.asarray(days, int), nbins, lags)
        sub = got[got.event_type == key].set_index("lag")["r"]
        for k in lags:
            assert abs(sub.loc[k] - want[k]) < 1e-9, (key, k)

    wk = got[got.event_type == "weekly"].set_index("lag")["r"]
    assert wk.loc[7] == wk.max() and wk.loc[7] > 0.5


def test_constant_series_zero_denominator():
    # every day the same count in a single-key table: den == 0 → 0.0
    df = _mk_events({"flat": list(range(30))})
    got = acf_by_key(ray.data.from_pandas(df), lags=(1, 2))
    assert (got["r"] == 0.0).all()
