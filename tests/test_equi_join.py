"""General equi-join (joins/equi_join.py): both plans vs a pandas merge
oracle — multi-match fan-out, left-outer nulls, collision suffixing,
and key types."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cartwright_ray.joins.equi_join import equi_join, equi_join_shuffle


def _tables(seed, n_a=500, n_b=200, n_keys=80):
    rng = np.random.default_rng(seed)
    a = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_a),
        "av": rng.integers(0, 1000, n_a),
        "name": [f"a{i}" for i in range(n_a)]})
    b = pd.DataFrame({
        "k": rng.integers(0, int(n_keys * 1.3), n_b),   # some unmatched
        "bv": rng.integers(0, 1000, n_b),
        "name": [f"b{i}" for i in range(n_b)]})         # collides with a
    return a, b


def _ds(ray, df, nblocks=4):
    import ray.data
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(nblocks)


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)[cols]


def test_broadcast_inner_matches_pandas(ray_session):
    a, b = _tables(1)
    got = equi_join(_ds(ray_session, a),
                    pa.Table.from_pandas(b, preserve_index=False),
                    on="k").to_pandas()
    want = a.merge(b, on="k", suffixes=("", "_r"))
    cols = ["k", "av", "name", "bv", "name_r"]
    pd.testing.assert_frame_equal(_sorted(got, cols), _sorted(want, cols))


def test_broadcast_left_keeps_unmatched(ray_session):
    a, b = _tables(2)
    got = equi_join(_ds(ray_session, a),
                    pa.Table.from_pandas(b, preserve_index=False),
                    on="k", how="left").to_pandas()
    want = a.merge(b, on="k", how="left", suffixes=("", "_r"))
    assert len(got) == len(want)
    assert got["bv"].isna().sum() == want["bv"].isna().sum()


def test_shuffle_inner_matches_pandas(ray_session):
    a, b = _tables(3)
    got = equi_join_shuffle(_ds(ray_session, a),
                            _ds(ray_session, b), on="k").to_pandas()
    want = a.merge(b, on="k", suffixes=("", "_r"))
    cols = ["k", "av", "name", "bv", "name_r"]
    pd.testing.assert_frame_equal(_sorted(got, cols), _sorted(want, cols))


def test_shuffle_string_keys(ray_session):
    a = pd.DataFrame({"k": ["x", "y", "x", "z"], "av": [1, 2, 3, 4]})
    b = pd.DataFrame({"k": ["x", "x", "w"], "bv": [10, 20, 30]})
    got = equi_join_shuffle(_ds(ray_session, a, 2),
                            _ds(ray_session, b, 2), on="k").to_pandas()
    want = a.merge(b, on="k")
    cols = ["k", "av", "bv"]
    pd.testing.assert_frame_equal(_sorted(got, cols), _sorted(want, cols))


def test_missing_key_rejected(ray_session):
    a = pd.DataFrame({"k": [1], "v": [1]})
    b = pd.DataFrame({"x": [1]})
    with pytest.raises(KeyError):
        equi_join_shuffle(_ds(ray_session, a, 1), _ds(ray_session, b, 1),
                          on="k")


def test_shuffle_left_outer_matches_pandas(ray_session):
    a, b = _tables(5)
    got = equi_join_shuffle(_ds(ray_session, a), _ds(ray_session, b),
                            on="k", how="left").to_pandas()
    want = a.merge(b, on="k", how="left", suffixes=("", "_r"))
    assert len(got) == len(want)
    assert got["bv"].isna().sum() == want["bv"].isna().sum()
    cols = ["k", "av", "name"]
    pd.testing.assert_frame_equal(_sorted(got, cols), _sorted(want, cols))


def test_shuffle_multi_column_keys(ray_session):
    rng = np.random.default_rng(7)
    a = pd.DataFrame({"k1": rng.integers(0, 10, 400),
                      "k2": rng.choice(["x", "y", "z"], 400),
                      "av": np.arange(400)})
    b = pd.DataFrame({"k1": rng.integers(0, 12, 150),
                      "k2": rng.choice(["x", "y", "w"], 150),
                      "bv": np.arange(150)})
    got = equi_join_shuffle(_ds(ray_session, a), _ds(ray_session, b),
                            on=["k1", "k2"]).to_pandas()
    want = a.merge(b, on=["k1", "k2"])
    cols = ["k1", "k2", "av", "bv"]
    pd.testing.assert_frame_equal(_sorted(got, cols), _sorted(want, cols))


def test_broadcast_multi_column_keys(ray_session):
    rng = np.random.default_rng(9)
    a = pd.DataFrame({"k1": rng.integers(0, 8, 300),
                      "k2": rng.integers(0, 4, 300), "av": np.arange(300)})
    b = pd.DataFrame({"k1": rng.integers(0, 8, 60),
                      "k2": rng.integers(0, 4, 60), "bv": np.arange(60)})
    got = equi_join(_ds(ray_session, a),
                    pa.Table.from_pandas(b, preserve_index=False),
                    on=["k1", "k2"]).to_pandas()
    want = a.merge(b, on=["k1", "k2"])
    cols = ["k1", "k2", "av", "bv"]
    pd.testing.assert_frame_equal(_sorted(got, cols), _sorted(want, cols))
