"""Geo-kernel unit/property tests (SURVEY.md §7.5 step 1)."""

import numpy as np
import pytest

from cartwright_ray.geo.geohash import geohash_decode, geohash_encode
from cartwright_ray.geo.haversine import haversine_km
from cartwright_ray.geo.hexgrid import (hex_cell, hex_cell_center, hex_parent,
                                        hex_res)
from cartwright_ray.geo.mercator import lonlat_to_tile, tile_quadkey
from cartwright_ray.geo.pip import points_in_polygon
from cartwright_ray.geo.s2 import s2_cell_id, s2_level, s2_parent, s2_token


def test_geohash_known_values():
    # public reference values from the geohash spec/wikipedia
    out = geohash_encode(np.array([57.64911, 42.605]),
                         np.array([10.40744, -5.603]), 11)
    assert out[0] == "u4pruydqqvj"
    assert out[0][:5] == "u4pru"
    out5 = geohash_encode(np.array([42.605]), np.array([-5.603]), 5)
    assert out5[0] == "ezs42"


def test_geohash_roundtrip():
    rng = np.random.default_rng(0)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-179, 179, 500)
    gh = geohash_encode(lat, lon, 9)
    dlat, dlon = geohash_decode(gh)
    # precision 9 cell ≈ 5m — decoded centers are within the cell
    assert np.abs(dlat - lat).max() < 3e-5
    assert np.abs(dlon - lon).max() < 5e-5
    # re-encode of the center reproduces the hash
    assert (geohash_encode(dlat, dlon, 9) == gh).all()


def test_mercator_tiles():
    x, y = lonlat_to_tile(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)
    x, y = lonlat_to_tile(np.array([-87.65]), np.array([41.85]), 17)
    assert (x[0], y[0]) == (33623, 48729)
    # extreme latitudes clamp into valid range
    x, y = lonlat_to_tile(np.array([179.9, -179.9]), np.array([89.9, -89.9]), 5)
    assert (0 <= x).all() and (x < 32).all()
    assert (0 <= y).all() and (y < 32).all()


def test_quadkey():
    x, y = lonlat_to_tile(np.array([0.1]), np.array([0.1]), 3)
    qk = tile_quadkey(x, y, 3)
    assert len(qk[0]) == 3
    # quadkey prefix property: zoom-2 quadkey is the prefix
    x2, y2 = lonlat_to_tile(np.array([0.1]), np.array([0.1]), 2)
    assert tile_quadkey(x2, y2, 2)[0] == qk[0][:2]


def test_s2_properties():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-85, 85, 5000)
    lon = rng.uniform(-180, 180, 5000)
    c12 = s2_cell_id(lat, lon, 12)
    c8 = s2_cell_id(lat, lon, 8)
    assert (s2_level(c12) == 12).all()
    assert (s2_level(c8) == 8).all()
    # parent truncation == recompute at coarser level
    assert (s2_parent(c12, 8) == c8).all()
    # cells at the same point are stable
    assert (s2_cell_id(lat, lon, 12) == c12).all()
    # tokens strip trailing zeros and are ≤16 chars
    toks = s2_token(c12[:100])
    assert all(1 <= len(t) <= 16 for t in toks)
    # face bits: equator/greenwich is on face 0
    assert int(s2_cell_id(np.array([0.0]), np.array([0.0]), 0)[0]) >> 61 == 0


def test_s2_locality():
    # nearby points at fine level share coarse ancestors
    base = s2_cell_id(np.array([10.0]), np.array([20.0]), 20)
    near = s2_cell_id(np.array([10.0001]), np.array([20.0001]), 20)
    assert s2_parent(base, 6)[0] == s2_parent(near, 6)[0]


def test_hexgrid_properties():
    rng = np.random.default_rng(2)
    # dense sampling of a small box → aperture ≈ 7 between resolutions
    lat = rng.uniform(10, 12, 40000)
    lon = rng.uniform(10, 12, 40000)
    h7 = hex_cell(lat, lon, 7)
    h8 = hex_cell(lat, lon, 8)
    assert (hex_res(h7) == 7).all()
    ratio = len(np.unique(h8)) / len(np.unique(h7))
    assert 5.5 < ratio < 8.5
    # child center lies inside its parent (definitionally)
    centers_lat, centers_lon = hex_cell_center(h8[:500])
    par = hex_parent(h8[:500], 7)
    assert (hex_cell(centers_lat, centers_lon, 7) == par).all()
    # cell centers are close to member points (within ~2 cell radii)
    clat, clon = hex_cell_center(h8)
    assert np.abs(clat - lat).max() < 1.0


def test_pip_square_and_concave():
    inside = points_in_polygon(
        np.array([0.5, 2.0, -0.5, 0.0001]), np.array([0.5, 0.5, 0.5, 0.5]),
        np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]))
    assert inside.tolist() == [True, False, False, True]
    # concave "L" shape
    ring_lat = [0, 0, 2, 2, 1, 1]
    ring_lon = [0, 2, 2, 1, 1, 0]
    inside = points_in_polygon(np.array([0.5, 1.5, 1.5]),
                               np.array([0.5, 0.5, 1.5]),
                               np.array(ring_lat), np.array(ring_lon))
    assert inside.tolist() == [True, False, True]


def test_haversine_known():
    # Paris ↔ London ≈ 344 km
    d = haversine_km(np.array([48.8566]), np.array([2.3522]),
                     np.array([51.5074]), np.array([-0.1278]))
    assert abs(d[0] - 344) < 5
    assert haversine_km(np.array([0.0]), np.array([0.0]),
                        np.array([0.0]), np.array([0.0]))[0] == 0.0


def test_s2_parent_rollup_consistent_with_direct_encode():
    """Rolling a fine cell up to a coarser level must equal encoding the
    point at that level directly — the property hierarchical aggregations
    (tile_pyramid analogue on S2) rely on."""
    import numpy as np

    from cartwright_ray.geo.s2 import s2_cell_id, s2_level, s2_parent
    rng = np.random.default_rng(33)
    lat = rng.uniform(-85, 85, 2000)
    lon = rng.uniform(-180, 180, 2000)
    fine = s2_cell_id(lat, lon, 14)
    for lvl in (12, 9, 6, 3):
        want = s2_cell_id(lat, lon, lvl)
        got = s2_parent(fine, lvl)
        assert (got == want).all()
        assert (s2_level(got) == lvl).all()


def test_polygon_area_rectangle_exact():
    """For a lat/lon-aligned rectangle the spherical-excess line integral
    equals the analytic band area R^2 * dlam * (sin p2 - sin p1)."""
    import numpy as np

    from cartwright_ray.geo.haversine import EARTH_RADIUS_KM
    from cartwright_ray.geo.polygon import polygon_area_km2
    for lat0, lat1, lon0, lon1 in [(0, 1, 0, 1), (40, 45, -10, 5),
                                   (-60, -50, 170, 179)]:
        area = polygon_area_km2([lat0, lat0, lat1, lat1],
                                [lon0, lon1, lon1, lon0])
        want = (EARTH_RADIUS_KM ** 2 * np.deg2rad(lon1 - lon0)
                * (np.sin(np.deg2rad(lat1)) - np.sin(np.deg2rad(lat0))))
        assert abs(area - want) / want < 1e-9


def test_polygon_area_antimeridian_wrap():
    from cartwright_ray.geo.polygon import polygon_area_km2
    a = polygon_area_km2([10, 10, 20, 20], [175, -175, -175, 175])
    b = polygon_area_km2([10, 10, 20, 20], [0, 10, 10, 0])
    assert abs(a - b) / b < 1e-9      # same box, shifted across the seam


def test_polygon_centroid_square():
    from cartwright_ray.geo.polygon import polygon_centroid
    lat, lon = polygon_centroid([0, 0, 2, 2], [10, 14, 14, 10])
    assert abs(lat - 1.0) < 1e-12 and abs(lon - 12.0) < 1e-12


def test_geohash_neighbors_properties():
    import numpy as np

    from cartwright_ray.geo.geohash import (geohash_decode, geohash_encode,
                                            geohash_neighbors)
    rng = np.random.default_rng(7)
    lat = rng.uniform(-80, 80, 200)
    lon = rng.uniform(-179, 179, 200)
    gh = geohash_encode(lat, lon, 6)
    nb = geohash_neighbors(gh)
    assert nb.shape == (200, 8)
    # neighbors are distinct from the cell and pairwise distinct
    for i in range(0, 200, 17):
        cells = set(nb[i]) | {gh[i]}
        assert len(cells) == 9
    # east neighbor's center is exactly one lon step away
    clat, clon = geohash_decode(gh)
    elat, elon = geohash_decode(nb[:, 0])
    lon_step = 360.0 / (1 << 15)
    assert np.allclose(elat, clat)
    assert np.allclose((elon - clon) % 360.0, lon_step)
    # antimeridian wrap: a cell hugging lon=180 has an east neighbor
    # on the west side
    g = geohash_encode(np.array([10.0]), np.array([179.999]), 6)
    e = geohash_neighbors(g)[0, 0]
    _, el = geohash_decode([e])
    assert el[0] < -179.9


def test_arrow_fastpath_encoders_match_reference_paths():
    """The buffer-built Arrow string arrays (geohash_encode_arrow /
    s2_token_arrow) must equal the plain numpy-string encoders
    element-for-element, including the zero-cell sentinel."""
    import numpy as np

    from cartwright_ray.geo.geohash import geohash_encode, geohash_encode_arrow
    from cartwright_ray.geo.s2 import s2_cell_id, s2_token, s2_token_arrow
    rng = np.random.default_rng(3)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    for p in (4, 9, 12):
        assert geohash_encode_arrow(lat, lon, p).to_pylist() \
            == list(geohash_encode(lat, lon, p))
    cells = s2_cell_id(lat, lon, 12)
    assert s2_token_arrow(cells).to_pylist() == list(s2_token(cells))
    zero = np.array([0], dtype=np.uint64)
    assert s2_token_arrow(zero).to_pylist() == ["X"]
