"""Skyline (Pareto frontier) and MAD outlier stats — brute-force
dominance / numpy-median oracles, tie coverage, block-layout
invariance."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from cartwright_ray.stages.normalize import mad_outliers_by_key
from cartwright_ray.stages.skyline import _frontier_mask, skyline_max


def skyline_brute(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    n = len(x)
    keep = np.ones(n, bool)
    for i in range(n):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        if dom.any():
            keep[i] = False
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_frontier_mask_matches_brute(seed):
    rng = np.random.default_rng(seed)
    n = 300
    # heavy ties: coordinates drawn from a small grid
    x = rng.integers(0, 12, n).astype(np.float64)
    y = rng.integers(0, 12, n).astype(np.float64)
    got = _frontier_mask(x, y)
    want = skyline_brute(x, y)
    assert (got == want).all()


def test_frontier_mask_exact_duplicates_all_kept():
    x = np.array([5.0, 5.0, 1.0, 5.0])
    y = np.array([7.0, 7.0, 9.0, 6.0])
    got = _frontier_mask(x, y)
    # (5,7) twice: coordinate-tied frontier rows both survive;
    # (1,9) undominated; (5,6) dominated by (5,7)
    assert got.tolist() == [True, True, True, False]


@pytest.mark.parametrize("blocks", [1, 2, 9])
def test_skyline_block_invariant(ray_session, blocks):
    rng = np.random.default_rng(42)
    n = 2000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "x": rng.integers(0, 400, n).astype(np.float64),
                       "y": rng.integers(0, 400, n).astype(np.float64)})
    want_ids = sorted(df.loc[skyline_brute(df["x"].to_numpy(),
                                           df["y"].to_numpy()),
                             "id"].tolist())
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = skyline_max(ds, "x", "y").to_pandas()
    assert sorted(got["id"].tolist()) == want_ids


def mad_brute(df: pd.DataFrame, n_mads: int = 3) -> pd.DataFrame:
    rows = []
    for k, g in df.groupby("k"):
        c = np.sort(np.floor(g["v"].to_numpy() * 100.0 + 0.5)
                    .astype(np.int64))
        n = len(c)
        med = int(c[(n + 1) // 2 - 1])
        dev = np.abs(c - med)
        mad = int(np.sort(dev)[(n + 1) // 2 - 1])
        rows.append((k, n, med, mad, int((dev > n_mads * mad).sum())))
    return pd.DataFrame(rows, columns=["k", "n", "median_cents",
                                       "mad_cents", "n_outliers"])


@pytest.mark.parametrize("blocks", [1, 6])
def test_mad_outliers_matches_brute(ray_session, blocks):
    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": np.where(rng.random(n) < 0.02,
                      rng.normal(500, 50, n),    # injected outliers
                      rng.normal(10, 2, n))})
    want = mad_brute(df).sort_values("k").reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = mad_outliers_by_key(ds, "k", "v").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mad_constant_values_zero_mad(ray_session):
    df = pd.DataFrame({"k": ["z"] * 10, "v": [3.25] * 10})
    got = mad_outliers_by_key(ray.data.from_pandas(df), "k", "v")
    assert got["mad_cents"].iloc[0] == 0
    assert got["n_outliers"].iloc[0] == 0
