"""Randomized cross-checks of the round-3 join family against their
brute-force oracles — permanent versions of the session fuzz sweeps
(seeds trimmed to keep the suite fast; the full sweeps ran 12+8+8+5+8
configurations with zero failures)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cartwright_ray.joins.box_join import box_join_shuffle, \
    brute_force_box_join
from cartwright_ray.joins.cover_join import cover_member_join
from cartwright_ray.joins.knn_join import brute_force_knn, knn_join_shuffle
from cartwright_ray.geo.geohash import geohash_encode


def _ds(ray, df, nb=3):
    import ray.data
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(nb)


@pytest.mark.parametrize("seed,cell_deg", [(1001, 8.0), (1003, 20.0)])
def test_box_join_shuffle_fuzz(ray_session, seed, cell_deg):
    rng = np.random.default_rng(seed)

    def boxes(n, pref):
        lat0 = rng.uniform(-89.9, 88, n)
        lon0 = rng.uniform(-180, 179, n)
        h, w = rng.uniform(0.01, 30, n), rng.uniform(0.01, 40, n)
        return {"box_id": np.array([f"{pref}{i}" for i in range(n)],
                                   object),
                "lat0": lat0, "lat1": np.minimum(lat0 + h, 90.0),
                "lon0": lon0, "lon1": np.minimum(lon0 + w, 180.0)}

    a, b = boxes(120, "A"), boxes(70, "B")
    got = box_join_shuffle(_ds(ray_session, pd.DataFrame(a)),
                           _ds(ray_session, pd.DataFrame(b), 2),
                           cell_deg=cell_deg).to_pandas()
    assert sorted(zip(got["a_id"], got["b_id"])) == \
        brute_force_box_join(a, b)


@pytest.mark.parametrize("seed,cap", [(4001, 10), (4003, 1_000_000)])
def test_knn_shuffle_salted_fuzz(ray_session, seed, cap):
    rng = np.random.default_rng(seed)
    n, m = 250, 150
    nh = int(n * 0.7)
    pts = pd.DataFrame({
        "doc_id": [f"p{i}" for i in range(n)],
        "lat": np.concatenate([rng.uniform(-3, 3, nh),
                               rng.uniform(-80, 80, n - nh)]),
        "lon": np.concatenate([rng.uniform(-3, 3, nh),
                               rng.uniform(-179, 179, n - nh)])})
    feats = pd.DataFrame({"feat_id": [f"F{i:03d}" for i in range(m)],
                          "lat": rng.uniform(-80, 80, m),
                          "lon": rng.uniform(-180, 180, m)})
    out = knn_join_shuffle(_ds(ray_session, pts),
                           _ds(ray_session, feats, 2),
                           k=3, cell_deg=9.0, salt_cap=cap).to_pandas()
    got = sorted(zip(out["doc_id"], out["neighbor_rank"], out["feat_id"]))
    fd = {"feat_id": feats["feat_id"].tolist(),
          "lat": feats["lat"].values, "lon": feats["lon"].values}
    want = sorted((pts["doc_id"].iloc[i], r, f) for i, r, f in
                  brute_force_knn(pts["lat"].values, pts["lon"].values,
                                  fd, k=3))
    assert got == want


def test_cover_join_fuzz(ray_session):
    rng = np.random.default_rng(3001)
    lat = rng.uniform(-85, 85, 1000)
    lon = rng.uniform(-180, 180, 1000)
    gh = geohash_encode(lat[:40], lon[:40], 5)
    Ls = rng.integers(1, 6, 40)
    cover = sorted({h[:L] for h, L in zip(gh, Ls)})
    pts = pd.DataFrame({"pid": np.arange(1000), "lat": lat, "lon": lon})
    out = cover_member_join(_ds(ray_session, pts), cover).to_pandas()
    full = geohash_encode(lat, lon, 5)
    want = sorted((i, c) for i, h in enumerate(full)
                  for c in cover if h.startswith(c))
    assert sorted(zip(out["pid"], out["cover_cell"])) == want
