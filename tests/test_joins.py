"""Spatial-join exactness vs brute-force oracles (FIXTURES.md F5), on a
zipf-skewed synthetic point set to exercise the salted-shuffle path."""

import numpy as np
import pandas as pd
import pytest

from cartwright_ray.joins.knn_join import brute_force_knn, knn_join
from cartwright_ray.joins.pip_join import (brute_force_pip, pip_join,
                                           pip_join_shuffle, salted_keys)
from cartwright_ray.joins.zonal import (brute_force_zonal, synth_tile_pixels,
                                        zonal_stats)
from cartwright_ray.sources.synth import ADMIN_POLYGONS


@pytest.fixture(scope="module")
def points_df():
    rng = np.random.default_rng(9)
    n = 3000
    # zipf mixture: 60% hot cluster inside the polygon tiling, rest uniform
    hot = rng.integers(0, 2, n).astype(bool)
    hot[: n // 2] = True
    lat = np.where(hot, rng.normal(2.0, 0.5, n), rng.uniform(-80, 80, n))
    lon = np.where(hot, rng.normal(5.0, 0.5, n), rng.uniform(-179, 179, n))
    return pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(n)],
        "span_idx": np.zeros(n, dtype=np.int32),
        "lat": lat, "lon": lon,
    })


def _keys(df):
    return sorted(zip(df["doc_id"], df["admin_id"]))


def test_pip_broadcast_exact(ray_session, points_df):
    import ray.data
    ds = ray.data.from_pandas(points_df).repartition(8)
    out = pip_join(ds, ADMIN_POLYGONS, concurrency=2).to_pandas()
    oracle = brute_force_pip(points_df["lat"].values, points_df["lon"].values,
                             ADMIN_POLYGONS)
    want = sorted((points_df["doc_id"].iloc[i], a) for i, a, _ in oracle)
    assert _keys(out) == want
    assert len(out)  # the hot cluster guarantees matches


def test_worker_index_caches_are_bounded():
    """The task-plan worker caches must not hoard one index per feature
    set forever in long-lived workers (ADVICE r03): inserting past the
    bound clears the cache."""
    import importlib

    import pyarrow as pa

    pj = importlib.import_module("cartwright_ray.joins.pip_join")

    saved = dict(pj._TASK_INDEX_CACHE)
    try:
        pj._TASK_INDEX_CACHE.clear()
        pj._TASK_INDEX_CACHE.update({("dummy", i): object() for i in range(9)})
        batch = pa.table({"lat": pa.array([2.0]), "lon": pa.array([5.0])})
        pj._pip_task(batch, ADMIN_POLYGONS, 2)
        assert len(pj._TASK_INDEX_CACHE) <= 2   # cleared, then repopulated
    finally:
        pj._TASK_INDEX_CACHE.clear()
        pj._TASK_INDEX_CACHE.update(saved)


def test_pip_shuffle_exact_with_salt(ray_session, points_df):
    import ray.data
    ds = ray.data.from_pandas(points_df).repartition(8)
    out = pip_join_shuffle(ds, ADMIN_POLYGONS, cap=100).to_pandas()
    oracle = brute_force_pip(points_df["lat"].values, points_df["lon"].values,
                             ADMIN_POLYGONS)
    want = sorted((points_df["doc_id"].iloc[i], a) for i, a, _ in oracle)
    assert _keys(out) == want


def test_salted_keys_split_hot_cells(ray_session, points_df):
    import pyarrow as pa
    import ray.data
    from cartwright_ray.geo.hexgrid import hex_cell

    df = points_df.copy()
    df["cell"] = hex_cell(df["lat"].values, df["lon"].values, 4)
    ds = ray.data.from_pandas(df).repartition(4)
    keyed, hot = salted_keys(ds, "cell", cap=200)
    assert hot, "zipf cluster should produce at least one hot cell"
    kdf = keyed.to_pandas()
    sizes = kdf.groupby("pip_key").size()
    # no salted group much larger than the cap
    assert sizes.max() <= 200 * 1.5


def test_antimeridian_and_pole(ray_session):
    import ray.data
    df = pd.DataFrame({
        "doc_id": ["east", "west", "pole", "none"],
        "span_idx": [0, 0, 0, 0],
        "lat": [0.0, 0.0, 87.0, 50.0],
        "lon": [175.0, -175.0, 123.0, 100.0],
    })
    out = pip_join(ray.data.from_pandas(df), ADMIN_POLYGONS).to_pandas()
    got = dict(zip(out["doc_id"], out["admin_id"]))
    assert got.get("east") == "A900"
    assert got.get("west") == "A900"
    assert got.get("pole") == "A901"
    assert "none" not in got


def test_knn_exact(ray_session, points_df):
    import ray.data
    rng = np.random.default_rng(11)
    feats = {"feat_id": [f"F{i}" for i in range(800)],
             "lat": rng.uniform(-70, 70, 800),
             "lon": rng.uniform(-170, 170, 800)}
    sub = points_df.head(300)
    out = knn_join(ray.data.from_pandas(sub).repartition(4), feats, k=3) \
        .to_pandas()
    oracle = brute_force_knn(sub["lat"].values, sub["lon"].values, feats, k=3)
    want = {}
    for i, rank, fid in oracle:
        want.setdefault(sub["doc_id"].iloc[i], set()).add(fid)
    got = {}
    for _, r in out.iterrows():
        got.setdefault(r["doc_id"], set()).add(r["feat_id"])
    assert got == want


def test_zonal_exact(ray_session):
    out = zonal_stats(ADMIN_POLYGONS[:8], zoom=7, concurrency=2) \
        .to_pandas().set_index("admin_id")
    oracle = brute_force_zonal(ADMIN_POLYGONS[:8], zoom=7)
    assert set(out.index) == set(oracle)
    for a, rec in oracle.items():
        assert out.loc[a, "px_count"] == rec["px_count"]
        assert out.loc[a, "px_sum"] == pytest.approx(rec["px_sum"], rel=1e-12)
        assert out.loc[a, "px_min"] == pytest.approx(rec["px_min"])
        assert out.loc[a, "px_max"] == pytest.approx(rec["px_max"])
        assert out.loc[a, "px_mean"] == pytest.approx(rec["px_mean"])


def test_synth_raster_deterministic():
    a = synth_tile_pixels(7, 10, 20)
    b = synth_tile_pixels(7, 10, 20)
    assert (a == b).all()
    assert a.shape == (64, 64)


def test_radius_join_exact(ray_session, points_df):
    import ray.data

    from cartwright_ray.joins.radius_join import (brute_force_radius,
                                                  radius_join)
    rng = np.random.default_rng(13)
    feats = {"feat_id": [f"F{i}" for i in range(400)],
             "lat": rng.uniform(-70, 70, 400),
             "lon": rng.uniform(-170, 170, 400)}
    sub = points_df.head(400)
    out = radius_join(ray.data.from_pandas(sub).repartition(4), feats,
                      radius_km=700.0).to_pandas()
    oracle = brute_force_radius(sub["lat"].values, sub["lon"].values,
                                feats, radius_km=700.0)
    want = sorted((sub["doc_id"].iloc[i], fid) for i, fid, _ in oracle)
    got = sorted(zip(out["doc_id"], out["feat_id"]))
    assert got == want
    assert len(out)          # the hot cluster guarantees some matches
    assert (out["dist_km"] <= 700.0).all()


def test_radius_join_zero_and_empty(ray_session):
    import ray.data

    from cartwright_ray.joins.radius_join import radius_join
    pts = pd.DataFrame({"doc_id": ["a", "b"],
                        "lat": [10.0, -60.0], "lon": [20.0, 100.0]})
    feats = {"feat_id": ["X"], "lat": np.array([10.0]),
             "lon": np.array([20.0])}
    out = radius_join(ray.data.from_pandas(pts), feats, 1.0).to_pandas()
    # the coincident point matches at distance 0; the far one doesn't
    assert list(out["doc_id"]) == ["a"] and float(out["dist_km"][0]) == 0.0
    none = radius_join(ray.data.from_pandas(pts), feats, 1e-9).to_pandas()
    assert list(none["doc_id"]) == ["a"]   # d == 0 <= any radius


def test_radius_join_shuffle_matches_broadcast(ray_session, points_df):
    import ray.data

    from cartwright_ray.joins.radius_join import (brute_force_radius,
                                                  radius_join_shuffle)
    rng = np.random.default_rng(17)
    m = 300
    feats = pd.DataFrame({
        "feat_id": [f"F{i}" for i in range(m)],
        # include polar and antimeridian features on purpose
        "lat": np.concatenate([rng.uniform(-88, 88, m - 4),
                               [84.0, -86.0, 10.0, -10.0]]),
        "lon": np.concatenate([rng.uniform(-180, 180, m - 4),
                               [30.0, -100.0, 179.9, -179.9]]),
    })
    sub = pd.concat([points_df.head(300), pd.DataFrame({
        "doc_id": ["p_pole", "p_anti"], "span_idx": [0, 0],
        "lat": [83.5, -9.8], "lon": [31.0, 179.95]})], ignore_index=True)
    out = radius_join_shuffle(
        ray.data.from_pandas(sub).repartition(4),
        ray.data.from_pandas(feats).repartition(3),
        radius_km=500.0).to_pandas()
    fdict = {"feat_id": feats["feat_id"].tolist(),
             "lat": feats["lat"].values, "lon": feats["lon"].values}
    oracle = brute_force_radius(sub["lat"].values, sub["lon"].values,
                                fdict, radius_km=500.0)
    want = sorted((sub["doc_id"].iloc[i], fid) for i, fid, _ in oracle)
    got = sorted(zip(out["doc_id"], out["feat_id_matched"]))
    assert got == want
    assert len(got)


def test_raster_downsample_exact_and_sparse(ray_session):
    from cartwright_ray.joins.zonal import raster_downsample

    def tile_fn(z, x, y, size=64):
        ix = x * size + np.arange(size, dtype=np.int64)
        iy = y * size + np.arange(size, dtype=np.int64)
        gx, gy = np.meshgrid(ix, iy)
        return ((gx * 3 + gy * 5) % 97).astype(np.float32)

    tiles = [(x, y) for x in range(8, 12) for y in range(4, 8)]
    out = raster_downsample(tiles, zoom=5, out_zoom=3,
                            tile_fn=tile_fn).to_pandas()
    assert sorted(zip(out["x"], out["y"])) == [(2, 1)]
    # brute force: the parent covers child pixels gx in [1024, 1280)
    gx, gy = np.meshgrid(np.arange(512, 768), np.arange(256, 512))
    allpx = (gx * 3 + gy * 5) % 97
    assert int(out["px_sum"].iloc[0]) == int(allpx.sum())
    blocks = allpx.reshape(64, 4, 64, 4).sum(axis=(1, 3))
    assert int(out["blk_min"].iloc[0]) == int(blocks.min())
    assert int(out["blk_max"].iloc[0]) == int(blocks.max())
    # pixels column: assembled integer means
    full = np.frombuffer(out["pixels"].iloc[0], dtype=np.float32) \
        .reshape(64, 64)
    assert np.array_equal(full, (blocks // 16).astype(np.float32))

    # sparse coverage: a lone child zero-fills the rest of its parent
    sparse = raster_downsample([(8, 4)], zoom=5, out_zoom=3,
                               tile_fn=tile_fn).to_pandas()
    one = tile_fn(5, 8, 4).astype(np.int64)
    assert int(sparse["px_sum"].iloc[0]) == int(one.sum())


def test_radius_join_shuffle_high_lat_antimeridian_column(ray_session):
    """Regression: with radius 500 the lon grid would have ended in a
    22.7-deg column (438-480 km at lat ~79) narrower than the radius —
    a pair whose disc fully crossed it was missed before the columns
    were rounded to divide 360 evenly."""
    import ray.data

    from cartwright_ray.joins.radius_join import (brute_force_radius,
                                                  radius_join_shuffle)
    pts = pd.DataFrame({
        "doc_id": ["edge", "ctrl"],
        "lat": [79.5, 79.5],
        "lon": [-179.99, 150.0],
    })
    feats = pd.DataFrame({
        "feat_id": ["Fnear", "Ffar"],
        "lat": [79.5, 10.0],
        "lon": [157.0, 0.0],
    })
    out = radius_join_shuffle(
        ray.data.from_pandas(pts), ray.data.from_pandas(feats),
        radius_km=500.0).to_pandas()
    fdict = {"feat_id": feats["feat_id"].tolist(),
             "lat": feats["lat"].values, "lon": feats["lon"].values}
    want = sorted((pts["doc_id"].iloc[i], fid) for i, fid, _ in
                  brute_force_radius(pts["lat"].values, pts["lon"].values,
                                     fdict, 500.0))
    got = sorted(zip(out["doc_id"], out["feat_id_matched"]))
    assert got == want
    assert ("edge", "Fnear") in got     # the pair the old grid missed


def test_knn_join_shuffle_matches_brute_force(ray_session, points_df):
    """The cell-keyed shuffle kNN plan (VERDICT r02 Missing #2) must
    reproduce the exact brute-force ranking — including polar points,
    antimeridian straddlers, and an isolated point whose 3 nearest
    features lie far outside its first-round 3x3 neighborhood (forces
    the doubling-retry path)."""
    import ray.data

    from cartwright_ray.joins.knn_join import knn_join_shuffle

    rng = np.random.default_rng(23)
    m = 400
    feats = pd.DataFrame({
        "feat_id": [f"F{i:04d}" for i in range(m)],
        "lat": np.concatenate([rng.uniform(-75, 75, m - 4),
                               [87.0, -88.0, 12.0, -12.0]]),
        "lon": np.concatenate([rng.uniform(-180, 180, m - 4),
                               [45.0, -120.0, 179.8, -179.8]]),
    })
    sub = pd.concat([points_df.head(200), pd.DataFrame({
        "doc_id": ["p_pole", "p_anti", "p_isolated"], "span_idx": [0, 0, 0],
        # p_isolated sits in the empty southern ocean band far from the
        # uniform draw's neighbors at small cell sizes
        "lat": [86.2, -11.9, -89.5], "lon": [44.0, 179.9, 0.0]})],
        ignore_index=True)
    out = knn_join_shuffle(
        ray.data.from_pandas(sub).repartition(4),
        ray.data.from_pandas(feats).repartition(3),
        k=3, cell_deg=6.0).to_pandas()
    fdict = {"feat_id": feats["feat_id"].tolist(),
             "lat": feats["lat"].values, "lon": feats["lon"].values}
    oracle = brute_force_knn(sub["lat"].values, sub["lon"].values, fdict, k=3)
    want = sorted((sub["doc_id"].iloc[i], rank, fid)
                  for i, rank, fid in oracle)
    got = sorted(zip(out["doc_id"], out["neighbor_rank"], out["feat_id"]))
    assert len(out) == 3 * len(sub)          # exactly k rows per point
    assert got == want


def test_knn_tie_band_overflow_beyond_margin(ray_session):
    """Regression (ADVICE r02): >16 features in the same 1mm rounded-
    distance tie band at the k boundary must still yield the lowest
    feat_id winners — the candidate window re-ranks against ALL features
    when the tie band overflows the margin."""
    import ray.data

    from cartwright_ray.joins.knn_join import knn_join

    n_tied = 30                       # > k + _MARGIN = 19
    feats = {"feat_id": [f"F{i:03d}" for i in range(n_tied)],
             "lat": [10.0] * n_tied,  # identical position => exact tie
             "lon": [20.0] * n_tied}
    pts = pd.DataFrame({"doc_id": ["p0"], "lat": [10.5], "lon": [20.5]})
    out = knn_join(ray.data.from_pandas(pts), feats, k=3).to_pandas()
    got = out.sort_values("neighbor_rank")["feat_id"].tolist()
    assert got == ["F000", "F001", "F002"]


def test_knn_join_shuffle_salted_hot_cell(ray_session):
    """Hot-cell salting: a cell holding most points splits into salted
    subgroups, features replicate per salt, and the result still equals
    brute force AND the unsalted plan exactly."""
    import ray.data

    from cartwright_ray.joins.knn_join import brute_force_knn, \
        knn_join_shuffle

    rng = np.random.default_rng(31)
    n = 600
    pts = pd.DataFrame({
        "doc_id": [f"p{i:04d}" for i in range(n)],
        # 80% of points crammed into one ~2x2 degree patch (one hot cell
        # at cell_deg=6), the rest spread out
        "lat": np.concatenate([rng.uniform(10.0, 12.0, int(n * 0.8)),
                               rng.uniform(-70, 70, n - int(n * 0.8))]),
        "lon": np.concatenate([rng.uniform(20.0, 22.0, int(n * 0.8)),
                               rng.uniform(-170, 170, n - int(n * 0.8))]),
    })
    m = 300
    feats = pd.DataFrame({
        "feat_id": [f"F{i:04d}" for i in range(m)],
        "lat": rng.uniform(-75, 75, m), "lon": rng.uniform(-180, 180, m)})
    fdict = {"feat_id": feats["feat_id"].tolist(),
             "lat": feats["lat"].values, "lon": feats["lon"].values}

    def run(cap):
        out = knn_join_shuffle(
            ray.data.from_pandas(pts).repartition(4),
            ray.data.from_pandas(feats).repartition(3),
            k=3, cell_deg=6.0, salt_cap=cap).to_pandas()
        return sorted(zip(out["doc_id"], out["neighbor_rank"],
                          out["feat_id"]))

    want = sorted((pts["doc_id"].iloc[i], rank, fid) for i, rank, fid in
                  brute_force_knn(pts["lat"].values, pts["lon"].values,
                                  fdict, k=3))
    salted = run(cap=25)          # hot cell count ~480 >> 25 => many salts
    assert salted == want
    assert run(cap=None) == want  # unsalted plan agrees
