"""trend_by_key — per-key OLS slope from exact integer moments.

Checks: (1) the distributed moments match a numpy float64 lstsq fit to
rtol (the statistics are right), (2) block-layout invariance is EXACT
(bit-identical slopes at 1/3/17 blocks — integer partials cannot drift),
(3) zero-variance x gives slope 0, (4) the cent rounding is
floor(v*100+0.5), half-up, not banker's.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.trend import HOURS_OFFSET, trend_by_key


def _mk(rng, n, keys):
    base = (HOURS_OFFSET + 1000) * 3_600_000_000
    return pd.DataFrame({
        "event_type": rng.choice(keys, n),
        "ts": pd.to_datetime(
            base + rng.integers(0, 10_000, n) * 3_600_000_000, unit="us"),
        "value": np.round(rng.normal(50, 20, n), 2)})


def _numpy_fit(df):
    out = {}
    for k, g in df.groupby("event_type"):
        x = (g["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000 - HOURS_OFFSET).to_numpy(np.float64)
        y = np.floor(g["value"].to_numpy() * 100 + 0.5) / 100.0
        if np.ptp(x) == 0:
            out[k] = 0.0
            continue
        out[k] = np.polyfit(x, y, 1)[0]
    return out


def test_matches_numpy_and_layout_exact():
    rng = np.random.default_rng(7)
    df = _mk(rng, 3000, ["a", "b", "c", "d"])
    runs = []
    for blocks in (1, 3, 17):
        ds = ray.data.from_pandas(df).repartition(blocks)
        runs.append(trend_by_key(ds))
    for r in runs[1:]:                      # exact layout invariance
        pd.testing.assert_frame_equal(r, runs[0])
    want = _numpy_fit(df)
    got = dict(zip(runs[0]["event_type"], runs[0]["slope"]))
    for k, s in want.items():
        assert np.isclose(got[k], s, rtol=1e-9), (k, got[k], s)


def test_zero_variance_x_and_half_up_cents():
    ts0 = pd.Timestamp((HOURS_OFFSET + 5) * 3_600_000_000, unit="us")
    df = pd.DataFrame({"event_type": ["z"] * 4, "ts": [ts0] * 4,
                       "value": [1.0, 2.0, 3.0, 4.0]})
    out = trend_by_key(ray.data.from_pandas(df))
    assert out.loc[0, "slope"] == 0.0 and out.loc[0, "n"] == 4

    # 0.125 * 100 = 12.5 cents: half-up -> 13 (banker's would give 12).
    # two points one hour apart, y = 0.00 then 0.125 -> slope 0.13
    ts1 = pd.Timestamp((HOURS_OFFSET + 6) * 3_600_000_000, unit="us")
    df = pd.DataFrame({"event_type": ["h", "h"], "ts": [ts0, ts1],
                       "value": [0.0, 0.125]})
    out = trend_by_key(ray.data.from_pandas(df))
    assert out.loc[0, "slope"] == 0.13
