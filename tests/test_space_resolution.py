"""Spatial-resolution golden grids (FIXTURES.md F3 — expectations from the
reference's `tests/test_geospatial_resolution_detection.py:12-19`,
regenerated deterministically as global regular grids)."""

import numpy as np
import pytest

from cartwright_ray.analysis.space_resolution import detect_latlon_resolution
from cartwright_ray.detectors.schemas import AngleUnit, Uniformity


def global_grid(step_deg: float):
    lats = np.arange(-90 + step_deg / 2, 90, step_deg)
    lons = np.arange(-180 + step_deg / 2, 180, step_deg)
    glat, glon = np.meshgrid(lats, lons)
    return glat.ravel(), glon.ravel()


@pytest.mark.parametrize("step", [0.5, 1.0, 2.0, 2.5, 5.0])
def test_golden_grids(step):
    lat, lon = global_grid(step)
    r = detect_latlon_resolution(lat, lon)
    assert r is not None and r.square is not None
    assert r.square.unit == AngleUnit.degrees
    assert abs(r.square.resolution - step) < 1e-6
    assert r.square.uniformity == Uniformity.PERFECT


_REF_GRIDS = "/root/reference/tests/test_data"


@pytest.mark.parametrize("fname,scale", [
    ("0.5_degree.csv", 0.5),
    ("1_degree.csv", 1.0),
    ("1_degree(1).csv", 1.0),
    ("2_degree.csv", 2.0),
    ("2.5_degree.csv", 2.5),
    ("5_degree.csv", 5.0),
])
def test_reference_golden_grid_files(fname, scale):
    """Read the reference's OWN fixture CSVs (expectations from
    `/root/reference/tests/test_geospatial_resolution_detection.py:12-28`):
    unit degrees, |resolution - scale| < 1e-6, square detection."""
    import os

    import pandas as pd
    path = os.path.join(_REF_GRIDS, fname)
    if not os.path.exists(path):
        pytest.skip("reference fixture files unavailable")
    df = pd.read_csv(path)
    lat = df.iloc[:, df.columns.get_loc("lat") if "lat" in df.columns else 0] \
            .to_numpy(dtype=float)
    lon = df.iloc[:, df.columns.get_loc("lon") if "lon" in df.columns else 1] \
            .to_numpy(dtype=float)
    r = detect_latlon_resolution(lat, lon)
    assert r is not None, fname
    assert r.square is not None, fname
    assert r.square.unit == AngleUnit.degrees, fname
    assert abs(r.square.resolution - scale) < 1e-6, fname


@pytest.mark.parametrize("step", [1.0, 2.0])
def test_column_order_irrelevant(step):
    lat, lon = global_grid(step)
    r1 = detect_latlon_resolution(lat, lon)
    # shuffled point order must not matter
    rng = np.random.default_rng(0)
    p = rng.permutation(lat.size)
    r2 = detect_latlon_resolution(lat[p], lon[p])
    assert r1.square.resolution == pytest.approx(r2.square.resolution)


@pytest.mark.parametrize("unit", list(AngleUnit))
@pytest.mark.parametrize("scale", [0.25, 0.5, 1.0, 1.5])
def test_synthetic_square(unit, scale):
    d = scale * unit.value
    lats = np.arange(0, 20 * d, d)[:20]
    lons = np.arange(0, 20 * d, d)[:20]
    glat, glon = np.meshgrid(lats, lons)
    r = detect_latlon_resolution(glat.ravel(), glon.ravel())
    assert r is not None and r.square is not None
    assert r.square.unit == unit
    assert abs(r.square.resolution - scale) < 1e-6


def test_rect_grid():
    lats = np.arange(0, 20 * 1.0, 1.0)[:20]
    lons = np.arange(0, 20 * 0.5, 0.5)[:20]
    glat, glon = np.meshgrid(lats, lons)
    r = detect_latlon_resolution(glat.ravel(), glon.ravel())
    assert r is not None and r.square is None
    assert r.lat.unit == AngleUnit.degrees
    assert abs(r.lat.resolution - 1.0) < 1e-6
    assert abs(r.lon.resolution - 0.5) < 1e-6


def test_scatter_returns_none():
    rng = np.random.default_rng(0)
    r = detect_latlon_resolution(rng.uniform(-80, 80, 3000),
                                 rng.uniform(-170, 170, 3000))
    assert r is None


def test_too_few_points():
    assert detect_latlon_resolution(np.array([1.0, 2.0]),
                                    np.array([1.0, 2.0])) is None


def test_nan_and_duplicates_filtered():
    lats = np.array([0, 0, 1, 1, 2, 2, np.nan, 0, 1])
    lons = np.array([0, 1, 0, 1, 0, 1, 5.0, 0, 1])
    r = detect_latlon_resolution(lats, lons)
    assert r is not None and r.square is not None
    assert abs(r.square.resolution - 1.0) < 1e-6
