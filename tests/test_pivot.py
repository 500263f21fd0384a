"""Pivot (stages/pivot.py) vs pandas crosstab/pivot_table."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cartwright_ray.stages.pivot import pivot


def _df(seed=7, n=3000):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user": rng.integers(0, 200, n),
        "kind": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.integers(0, 100, n).astype(np.float64)})


def _ds(ray, df, nblocks=6):
    import ray.data
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(nblocks)


@pytest.mark.parametrize("plan", [{}, {"small_limit": 0}])
def test_pivot_count_matches_pandas(ray_session, plan):
    df = _df()
    got = pivot(_ds(ray_session, df), "user", "kind", **plan).to_pandas() \
        .sort_values("user").reset_index(drop=True)
    want = pd.crosstab(df["user"], df["kind"]) \
        .reindex(columns=["a", "b", "c", "d"], fill_value=0) \
        .reset_index().rename_axis(None, axis=1)
    for c in ["a", "b", "c", "d"]:
        assert list(got[c]) == list(want[c]), c


def test_pivot_sum_matches_pandas(ray_session):
    df = _df(11)
    got = pivot(_ds(ray_session, df), "user", "kind", value_col="v",
                agg="sum").to_pandas().sort_values("user") \
        .reset_index(drop=True)
    want = df.pivot_table(index="user", columns="kind", values="v",
                          aggfunc="sum", fill_value=0) \
        .reindex(columns=["a", "b", "c", "d"], fill_value=0).reset_index()
    for c in ["a", "b", "c", "d"]:
        np.testing.assert_allclose(got[c], want[c], rtol=1e-12)


def test_pivot_explicit_values_fixes_schema(ray_session):
    df = _df(13)
    got = pivot(_ds(ray_session, df), "user", "kind",
                pivot_values=["a", "b", "zz"]).to_pandas()
    assert list(got.columns) == ["user", "a", "b", "zz"]
    assert (got["zz"] == 0).all()


def test_pivot_bad_agg_rejected(ray_session):
    with pytest.raises(ValueError):
        pivot(_ds(ray_session, _df(), 1), "user", "kind", agg="median")


def test_pivot_value_colliding_with_key_rejected(ray_session):
    """A pivot value whose string equals key_col would overwrite the key
    column in the wide partial (ADVICE r03) — rejected up front."""
    df = _df(19)
    df.loc[df["kind"] == "a", "kind"] = "user"
    with pytest.raises(ValueError, match="collides"):
        pivot(_ds(ray_session, df, 2), "user", "kind")


def test_melt_roundtrips_pivot(ray_session):
    """melt(pivot(ds)) recovers the long counts table exactly."""
    from cartwright_ray.stages.pivot import melt
    df = _df(17)
    wide = pivot(_ds(ray_session, df), "user", "kind",
                 pivot_values=["a", "b", "c", "d"])
    long = melt(wide, "user", ["a", "b", "c", "d"]).to_pandas()
    want = pd.crosstab(df["user"], df["kind"]) \
        .reindex(columns=["a", "b", "c", "d"], fill_value=0) \
        .stack().reset_index()
    want.columns = ["user", "variable", "value"]
    got = long.sort_values(["user", "variable"]).reset_index(drop=True)
    want = want.sort_values(["user", "variable"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["value"].to_numpy(dtype=np.float64),
                                  want["value"].to_numpy(dtype=np.float64))
