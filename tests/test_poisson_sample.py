"""sequential_poisson_sample — weighted PPS sampling with exact-
arithmetic priorities."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.sampling import (lehmer_hash,
                                            sequential_poisson_sample,
                                            _LEHMER_MOD)


def _brute(df: pd.DataFrame, k: int, weight_col: str):
    w = df[weight_col].to_numpy(np.float64)
    u = (lehmer_hash(df["doc_id"].to_numpy()) + 0.5) / _LEHMER_MOD
    xi = u / w
    ok = df[w > 0].assign(xi=xi[w > 0])
    win = ok.sort_values(["xi", "doc_id"]).head(k)
    return win.sort_values("doc_id").reset_index(drop=True)


def _run(df: pd.DataFrame, k: int, blocks: int):
    ds = ray.data.from_pandas(df).repartition(blocks)
    return (sequential_poisson_sample(ds, k=k, weight_col="w")
            .to_pandas().reset_index(drop=True))


def test_matches_brute_and_block_invariant():
    rng = np.random.default_rng(13)
    df = pd.DataFrame({"doc_id": np.arange(1, 401),
                       "w": rng.integers(1, 500, 400).astype("int64"),
                       "tag": [f"s{i%7}" for i in range(400)]})
    want = _brute(df, 25, "w")
    got4 = _run(df, 25, blocks=4)
    got13 = _run(df, 25, blocks=13)
    pd.testing.assert_frame_equal(got4, want, check_exact=True)
    pd.testing.assert_frame_equal(got13, want, check_exact=True)


def test_heavier_rows_win_more():
    # two strata with 10x weight ratio: the heavy stratum must take a
    # clear majority of a PPS sample
    df = pd.DataFrame({"doc_id": np.arange(1, 2001),
                       "w": np.where(np.arange(2000) < 1000, 10, 100)})
    got = _run(df, 200, blocks=6)
    heavy = (got["doc_id"] > 1000).sum()
    assert heavy > 130                       # expectation ≈ 182/200


def test_nonpositive_weights_excluded_and_small_input():
    df = pd.DataFrame({"doc_id": np.arange(1, 11),
                       "w": [5, 0, 3, -1, 2, 0, 1, 4, 6, 7]})
    got = _run(df, 50, blocks=3)             # k > eligible rows
    assert len(got) == 7
    assert (got["w"] > 0).all()
    pd.testing.assert_frame_equal(got, _brute(df, 50, "w"),
                                  check_exact=True)
