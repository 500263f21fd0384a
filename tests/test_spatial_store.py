"""Geohash-partitioned spatial store (sources/spatial_store.py):
pruned bbox reads equal full-scan filters, the cover is sound, and the
pruning actually prunes."""

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pytest

from cartwright_ray.geo.geohash import geohash_encode
from cartwright_ray.sources.spatial_store import (bbox_cover_prefixes,
                                                  read_bbox,
                                                  write_spatial_partitioned)


def _points(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    return (np.arange(n, dtype=np.int64),
            rng.uniform(-90, 90, n),
            rng.uniform(-180, 180, n))


@pytest.fixture(scope="module")
def store(ray_session):
    import ray.data
    ids, lat, lon = _points()
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon)}))
    path = tempfile.mkdtemp(prefix="spstore_test_")
    write_spatial_partitioned(ds, path, precision=1)
    yield path, ids, lat, lon
    shutil.rmtree(path, ignore_errors=True)


@pytest.mark.parametrize("box", [
    (10.0, 40.0, -30.0, 20.0),
    (-90.0, -60.0, 100.0, 180.0),        # polar + antimeridian edge
    (59.9, 60.1, -0.1, 0.1),             # tiny box
    (-90.0, 90.0, -180.0, 180.0),        # whole world
])
def test_bbox_read_equals_full_scan(store, box):
    path, ids, lat, lon = store
    lat0, lat1, lon0, lon1 = box
    got = read_bbox(path, *box, precision=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    m = (lat >= lat0) & (lat <= lat1) & (lon >= lon0) & (lon <= lon1)
    want = np.sort(ids[m])
    assert list(got["vec_id"]) == list(want)


def test_cover_is_sound():
    """Every point inside the box encodes to a prefix in the cover."""
    rng = np.random.default_rng(3)
    for p in (1, 2, 3):
        lat0, lat1, lon0, lon1 = -12.3, 31.7, 140.0, 179.99
        cover = set(bbox_cover_prefixes(lat0, lat1, lon0, lon1, p))
        lat = rng.uniform(lat0, lat1, 2000)
        lon = rng.uniform(lon0, lon1, 2000)
        cells = geohash_encode(lat, lon, p)
        assert set(cells.tolist()) <= cover


def test_pruning_prunes(store):
    """A small box opens strictly fewer partition dirs than exist."""
    path, *_ = store
    n_parts = len([d for d in os.listdir(path) if d.startswith("gh=")])
    cover = bbox_cover_prefixes(10.0, 40.0, -30.0, 20.0, 1)
    hit = [c for c in cover if os.path.isdir(os.path.join(path, f"gh={c}"))]
    assert len(hit) < n_parts
    assert len(hit) >= 1


def test_wrap_box_rejected():
    with pytest.raises(ValueError):
        bbox_cover_prefixes(0.0, 10.0, 170.0, -170.0, 2)


def test_empty_cover_returns_none(ray_session):
    import ray.data
    path = tempfile.mkdtemp(prefix="spstore_empty_")
    try:
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([1], pa.int64()),
            "lat": pa.array([80.0]), "lon": pa.array([170.0])}))
        write_spatial_partitioned(ds, path, precision=2)
        # box far from the written point: cover exists but no dirs match
        assert read_bbox(path, -10.0, -5.0, -10.0, -5.0, precision=2) is None
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.mark.parametrize("cols", [
    ["vec_id"],                  # neither lat nor lon requested
    ["vec_id", "lat"],           # lat but NOT lon (KeyError before, ADVICE r03)
    ["vec_id", "lon"],           # lon but NOT lat
    ["vec_id", "lat", "lon"],    # both requested — nothing appended
])
def test_bbox_read_projection_honored(store, cols):
    """read_bbox extends the projection with whichever of lat/lon the
    residual needs and DROPS the appended columns after filtering — the
    caller gets exactly the projection it asked for (ADVICE r03)."""
    path, ids, lat, lon = store
    box = (10.0, 40.0, -30.0, 20.0)
    got = read_bbox(path, *box, precision=1, columns=cols).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert list(got.columns) == cols
    lat0, lat1, lon0, lon1 = box
    m = (lat >= lat0) & (lat <= lat1) & (lon >= lon0) & (lon <= lon1)
    assert list(got["vec_id"]) == list(np.sort(ids[m]))


def test_radius_read_projection_honored(store):
    from cartwright_ray.geo.haversine import haversine_km
    from cartwright_ray.sources.spatial_store import read_radius
    path, ids, lat, lon = store
    got = read_radius(path, 20.0, 10.0, 1500.0, precision=1,
                      columns=["vec_id", "lat"]).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert list(got.columns) == ["vec_id", "lat"]
    d = haversine_km(lat, lon, np.full_like(lat, 20.0),
                     np.full_like(lon, 10.0))
    assert list(got["vec_id"]) == list(np.sort(ids[d <= 1500.0]))


# ---- radius reads --------------------------------------------------------

def test_radius_read_equals_full_scan(store):
    from cartwright_ray.geo.haversine import haversine_km
    from cartwright_ray.sources.spatial_store import read_radius
    path, ids, lat, lon = store
    for clat, clon, r in [(20.0, 10.0, 2500.0),
                          (0.0, 178.0, 1500.0),      # antimeridian cap
                          (85.0, 0.0, 2000.0)]:      # polar cap
        got = read_radius(path, clat, clon, r, precision=1)
        got_ids = sorted(got.to_pandas()["vec_id"]) if got is not None else []
        d = haversine_km(lat, lon, np.full_like(lat, clat),
                         np.full_like(lon, clon))
        want = sorted(ids[d <= r])
        assert got_ids == want, (clat, clon, r)


def test_cap_bbox_contains_cap():
    """Every point within radius lies inside the cap's bbox spans."""
    from cartwright_ray.geo.haversine import haversine_km
    from cartwright_ray.sources.spatial_store import _cap_bbox
    rng = np.random.default_rng(9)
    for clat, clon, r in [(40.0, -100.0, 800.0), (10.0, 179.5, 500.0),
                          (-88.0, 30.0, 1000.0)]:
        lat0, lat1, spans = _cap_bbox(clat, clon, r)
        lat = rng.uniform(-90, 90, 20000)
        lon = rng.uniform(-180, 180, 20000)
        d = haversine_km(lat, lon, np.full_like(lat, clat),
                         np.full_like(lon, clon))
        inside = d <= r
        in_box = (lat >= lat0) & (lat <= lat1) & np.any(
            [(lon >= a) & (lon <= b) for a, b in spans], axis=0)
        assert not (inside & ~in_box).any(), (clat, clon, r)


# ---- resumable (checkpointed) layout -------------------------------------

def test_resumable_store_write_and_resume(ray_session):
    """Checkpointed layout: reads match the hive layout; killing one
    partition re-writes ONLY that partition on the next run."""
    import json

    import ray.data
    from cartwright_ray.sources.spatial_store import _pid_of_cell

    ids, lat, lon = _points(n=2000, seed=13)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon)}))
    path = tempfile.mkdtemp(prefix="spstore_ckpt_")
    try:
        stats = write_spatial_partitioned(ds, path, precision=1,
                                          resumable=True)
        assert stats["skipped"] == 0 and stats["rows"] == 2000
        n_parts = stats["written"]

        # pruned read over the checkpointed layout == full-scan filter
        box = (10.0, 40.0, -30.0, 20.0)
        got = read_bbox(path, *box, precision=1).to_pandas()
        m = (lat >= box[0]) & (lat <= box[1]) \
            & (lon >= box[2]) & (lon <= box[3])
        assert sorted(got["vec_id"]) == sorted(ids[m])
        assert set(got.columns) == {"vec_id", "lat", "lon"}

        # kill one finished partition (data + manifest) and resume
        victim = json.load(open(os.path.join(
            path, "_manifest", sorted(os.listdir(
                os.path.join(path, "_manifest")))[0])))
        pid = victim["partition_id"]
        assert pid == _pid_of_cell(victim["key"])
        os.remove(os.path.join(path, f"part-{pid}.parquet"))
        os.remove(os.path.join(path, "_manifest", f"{pid}.json"))

        stats2 = write_spatial_partitioned(ds, path, precision=1,
                                           resumable=True)
        assert stats2["written"] == 1
        assert stats2["skipped"] == n_parts - 1
    finally:
        shutil.rmtree(path, ignore_errors=True)
