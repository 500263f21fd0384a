"""idw_interpolate — inverse-distance-weighted interpolation.

Brute-force differential oracle over random observation clouds, plus
block-count invariance (the per-block k-smallest partial merge must be
layout-independent), the exact-hit rule, and fewer-than-k inputs.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.joins.idw import idw_interpolate


def _brute(df, queries, k):
    rows = []
    for qid, qlat, qlon in queries:
        d2 = ((df.lat - qlat) ** 2 + (df.lon - qlon) ** 2).to_numpy()
        order = np.lexsort((df.pid.to_numpy(), d2))[:k]
        dd, vv = d2[order], df.value.to_numpy()[order]
        if (dd == 0).any():
            est = vv[dd == 0].mean()
        else:
            w = 1.0 / dd
            est = (w * vv).sum() / w.sum()
        rows.append({"query_id": qid, "n_neighbors": len(order),
                     "idw_value": np.floor(est * 1e6) / 1e6})
    return pd.DataFrame(rows).sort_values("query_id") \
        .reset_index(drop=True)


def _run(df, queries, k, blocks):
    ds = ray.data.from_pandas(df).repartition(blocks)
    return idw_interpolate(ds, queries, k=k, val_col="value",
                           id_cols=("pid",)).to_pandas()


def test_matches_brute_and_block_invariant():
    rng = np.random.default_rng(17)
    df = pd.DataFrame({"pid": np.arange(300),
                       "lat": rng.uniform(-60, 60, 300),
                       "lon": rng.uniform(-150, 150, 300),
                       "value": rng.uniform(0, 100, 300)})
    queries = [(1, 10.3, 20.7), (2, -45.1, 88.8), (3, 59.9, -149.0)]
    want = _brute(df, queries, 8)
    pd.testing.assert_frame_equal(_run(df, queries, 8, blocks=4), want)
    pd.testing.assert_frame_equal(_run(df, queries, 8, blocks=11), want)


def test_exact_hit_uses_coincident_mean():
    df = pd.DataFrame({"pid": [0, 1, 2, 3],
                       "lat": [10.0, 10.0, 11.0, 12.0],
                       "lon": [20.0, 20.0, 21.0, 22.0],
                       "value": [4.0, 6.0, 100.0, 200.0]})
    out = _run(df, [(7, 10.0, 20.0)], k=3, blocks=2)
    # two coincident observations -> plain mean, far point ignored
    assert out.loc[0, "idw_value"] == 5.0
    pd.testing.assert_frame_equal(out, _brute(df, [(7, 10.0, 20.0)], 3))


def test_fewer_points_than_k():
    df = pd.DataFrame({"pid": [0, 1], "lat": [0.0, 1.0],
                       "lon": [0.0, 1.0], "value": [10.0, 30.0]})
    out = _run(df, [(1, 0.4, 0.4)], k=8, blocks=2)
    assert out.loc[0, "n_neighbors"] == 2
    pd.testing.assert_frame_equal(out, _brute(df, [(1, 0.4, 0.4)], 8))
