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


@pytest.mark.parametrize("seed", [21, 22])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_shuffle_salted_zipf_skew_matches_unsalted_and_sql(ray_session,
                                                           seed, how):
    """VERDICT r03 Next #4: on a zipf-skewed key (one key carries ~40%
    of the A side), the salted plan (tiny cap → many salts) returns
    row-identical results to the unsalted plan AND to a DuckDB join."""
    import duckdb

    rng = np.random.default_rng(seed)
    n_a, n_b = 4000, 300
    # zipf-ish: key 0 is mega-hot on A, plus a mild long tail
    ka = np.where(rng.random(n_a) < 0.4, 0,
                  rng.zipf(1.6, n_a).clip(0, 50))
    a = pd.DataFrame({"k": ka.astype(np.int64),
                      "av": rng.integers(0, 1000, n_a)})
    b = pd.DataFrame({"k": rng.integers(0, 55, n_b).astype(np.int64),
                      "bv": rng.integers(0, 1000, n_b)})

    unsalted = equi_join_shuffle(_ds(ray_session, a, 6),
                                 _ds(ray_session, b, 4),
                                 on="k", how=how).to_pandas()
    salted = equi_join_shuffle(_ds(ray_session, a, 6),
                               _ds(ray_session, b, 4),
                               on="k", how=how, salt_cap=100,
                               max_salts=16).to_pandas()
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    want = con.execute(
        f"SELECT a.k, a.av, b.bv FROM a {jt} b USING (k)").df()
    cols = ["k", "av", "bv"]
    pd.testing.assert_frame_equal(
        _sorted(salted, cols), _sorted(unsalted, cols))
    pd.testing.assert_frame_equal(
        _sorted(salted, cols).astype({"bv": "float64"}),
        _sorted(want, cols).astype({"bv": "float64"}))


def test_per_key_round_robin_uniform_under_interleave():
    """ADVICE r04: two hot keys interleaved stride-2 in one batch, each
    with K=2 salts — a shared batch counter gives each key ONLY evens
    (or only odds) of the counter, i.e. a single salt. The per-key
    rebase must spread each key evenly over its own salts."""
    import numpy as np

    from cartwright_ray.joins.equi_join import _per_key_round_robin

    # slots alternate 0,1,0,1,... (stride-2 interleave), 40 rows each
    pos = np.tile(np.array([0, 1]), 40)
    hot_k = np.array([2, 2], dtype=np.int64)
    salts = _per_key_round_robin(pos, hot_k)
    for slot in (0, 1):
        counts = np.bincount(salts[pos == slot], minlength=2)
        assert counts.tolist() == [20, 20]
    # mixed K: key 0 has 3 salts, key 1 has 2; 30 rows each interleaved
    pos = np.tile(np.array([0, 1]), 30)
    hot_k = np.array([3, 2], dtype=np.int64)
    salts = _per_key_round_robin(pos, hot_k)
    assert np.bincount(salts[pos == 0], minlength=3).tolist() == [10] * 3
    assert np.bincount(salts[pos == 1], minlength=2).tolist() == [15] * 2
    # order within the batch is preserved per key (0,1,2,0,1,2,...)
    assert salts[pos == 0][:4].tolist() == [0, 1, 2, 0]


def test_salted_plan_actually_salts(ray_session):
    """The hot key's A rows really do spread over several salts (the
    mitigation is live, not a no-op)."""
    import importlib

    ej = importlib.import_module("cartwright_ray.joins.equi_join")
    a = pd.DataFrame({"k": np.zeros(1000, np.int64),
                      "av": np.arange(1000)})
    b = pd.DataFrame({"k": np.array([0, 1], np.int64), "bv": [7, 8]})
    a_s, b_s = ej._salt_hot_keys(_ds(ray_session, a, 2),
                                 _ds(ray_session, b, 1), ["k"], 100, 16)
    a_salts = a_s.to_pandas()["__ej_salt"]
    assert a_salts.nunique() >= 8            # 1000/100 → 10 salts
    bp = b_s.to_pandas()
    assert (bp["k"] == 0).sum() == a_salts.nunique()   # replicated per salt
    assert (bp["k"] == 1).sum() == 1                    # cold key untouched


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


def test_shuffle_salted_string_keys(ray_session):
    """STRING join keys through the salted plan: the hot-key hash uses
    pd.util.hash_array, whose hash_key must be exactly 16 bytes for
    object arrays — a 17-byte key crashed here (caught in review) while
    integer-key tests sailed through (numeric hashing ignores the key)."""
    import duckdb

    rng = np.random.default_rng(3)
    a = pd.DataFrame({
        "k": np.where(rng.random(2000) < 0.5, "hot",
                      rng.integers(0, 20, 2000).astype(str)),
        "av": rng.integers(0, 1000, 2000)})
    b = pd.DataFrame({"k": [str(i) for i in range(20)] + ["hot"],
                      "bv": np.arange(21)})
    salted = equi_join_shuffle(_ds(ray_session, a, 6),
                               _ds(ray_session, b, 3),
                               on="k", salt_cap=100,
                               max_salts=8).to_pandas()
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    want = con.execute(
        "SELECT a.k, a.av, b.bv FROM a JOIN b USING (k)").df()
    cols = ["k", "av", "bv"]
    pd.testing.assert_frame_equal(_sorted(salted, cols),
                                  _sorted(want, cols))
