"""Hypothesis property tests over the pure kernels (fast, no Ray)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cartwright_ray.detectors.cascade import classify_series
from cartwright_ray.geo.geohash import geohash_decode, geohash_encode
from cartwright_ray.geo.hexgrid import hex_cell, hex_cell_center
from cartwright_ray.geo.mercator import lonlat_to_tile
from cartwright_ray.geo.s2 import s2_cell_id, s2_level, s2_parent

lat_st = st.floats(min_value=-84.9, max_value=84.9,
                   allow_nan=False, allow_infinity=False)
lon_st = st.floats(min_value=-179.9, max_value=179.9,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_geohash_roundtrip_property(lat, lon):
    gh = geohash_encode(np.array([lat]), np.array([lon]), 10)
    dlat, dlon = geohash_decode(gh)
    assert abs(dlat[0] - lat) < 1e-4
    assert abs(dlon[0] - lon) < 2e-4
    assert (geohash_encode(dlat, dlon, 10) == gh).all()


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st,
       fine=st.integers(min_value=1, max_value=24),
       coarse_delta=st.integers(min_value=0, max_value=10))
def test_s2_parent_property(lat, lon, fine, coarse_delta):
    coarse = max(0, fine - coarse_delta)
    cf = s2_cell_id(np.array([lat]), np.array([lon]), fine)
    cc = s2_cell_id(np.array([lat]), np.array([lon]), coarse)
    assert s2_level(cf)[0] == fine
    assert s2_parent(cf, coarse)[0] == cc[0]


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=0, max_value=10))
def test_hex_center_in_own_cell(lat, lon, res):
    c = hex_cell(np.array([lat]), np.array([lon]), res)
    clat, clon = hex_cell_center(c)
    assert hex_cell(clat, clon, res)[0] == c[0]


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st, zoom=st.integers(min_value=0, max_value=18))
def test_tile_bounds_property(lat, lon, zoom):
    x, y = lonlat_to_tile(np.array([lon]), np.array([lat]), zoom)
    assert 0 <= x[0] < (1 << zoom)
    assert 0 <= y[0] < (1 << zoom)


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(st.floats(min_value=-89.9, max_value=89.9,
                               allow_nan=False), min_size=5, max_size=30))
def test_classify_deterministic_property(vals):
    samples = [f"{v:.6f}" for v in vals]
    a = classify_series(samples)
    b = classify_series(list(samples))
    assert a == b
