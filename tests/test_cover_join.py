"""Cover-membership join (joins/cover_join.py) vs plain-Python prefix
matching, including nested cover cells and empty-match batches."""

import numpy as np
import pyarrow as pa
import pytest

from cartwright_ray.geo.geohash import geohash_encode
from cartwright_ray.joins.cover_join import cover_member_join


def _pts_ds(ray, lat, lon, nblocks=4):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "pid": pa.array(np.arange(len(lat), dtype=np.int64)),
        "lat": pa.array(lat), "lon": pa.array(lon)})).repartition(nblocks)


def _brute(lat, lon, cover, max_len):
    gh = geohash_encode(lat, lon, max_len)
    out = []
    for i, h in enumerate(gh):
        for c in cover:
            if h.startswith(c):
                out.append((i, c))
    return sorted(out)


def test_matches_brute_force_mixed_precision(ray_session):
    rng = np.random.default_rng(17)
    lat = rng.uniform(-85, 85, 3000)
    lon = rng.uniform(-180, 180, 3000)
    # cover: real cells of some points (guaranteed hits) + noise cells
    gh = geohash_encode(lat[:80], lon[:80], 4)
    cover = sorted({h[:2] for h in gh[:30]} | {h[:3] for h in gh[30:60]}
                   | set(gh[60:80]) | {"zzz", "00"})
    out = cover_member_join(_pts_ds(ray_session, lat, lon),
                            cover).to_pandas()
    got = sorted(zip(out["pid"], out["cover_cell"]))
    assert got == _brute(lat, lon, cover, 4)
    assert len(got) > 0


def test_nested_cover_cells_both_match(ray_session):
    lat = np.array([40.0]); lon = np.array([-100.0])
    h = geohash_encode(lat, lon, 4)[0]
    cover = [h[:2], h[:4]]                # nested: both must emit
    out = cover_member_join(_pts_ds(ray_session, lat, lon, 1),
                            cover).to_pandas()
    assert sorted(out["cover_cell"]) == sorted(cover)


def test_no_match_empty_result(ray_session):
    lat = np.array([40.0]); lon = np.array([-100.0])
    out = cover_member_join(_pts_ds(ray_session, lat, lon, 1),
                            ["zzzz"]).to_pandas()
    # Ray drops column metadata when EVERY block is empty (known quirk,
    # see tests/test_bloom.py) — assert emptiness only
    assert len(out) == 0


def test_empty_cover_rejected(ray_session):
    with pytest.raises(ValueError):
        cover_member_join(_pts_ds(ray_session, np.array([0.0]),
                                  np.array([0.0]), 1), [])
