"""Scatter-cloud differential tests for grid-resolution detection
(VERDICT r04 Missing #4).

The engine's axis-delta detector (`analysis/space_resolution.py`) replaces
the reference's Delaunay-edge algorithm
(`reference/cartwright/analysis/space_resolution.py:52-74`: triangulate,
keep edges whose cross-axis delta is < 1e-6 rad, reject when axis-parallel
edges are < 1/3 of all triangle edges). These tests verify the two
algorithms make the SAME grid/no-grid decision on scattered (non-grid)
point clouds — the case the round-4 verdict flagged as untested.

scipy is not available in this sandbox, so the reference's gate is
replayed with a small pure-numpy Bowyer-Watson Delaunay triangulation
(public textbook algorithm) on modest point counts. When scipy IS
importable, an extra test runs the real `scipy.spatial.Delaunay` for a
true differential.

Known, documented divergence (asserted below): a rows-only cloud (points
sharing exact latitudes but with random longitudes) makes the reference
compute `np.median([])` -> NaN for the vertical spacing and return a
NaN-filled resolution; the engine returns None. The engine's behavior is
the deliberate fixed point (SURVEY.md §7.1).
"""

from __future__ import annotations

import numpy as np
import pytest

from cartwright_ray.analysis.space_resolution import detect_latlon_resolution


# ---------------------------------------------------------------------------
# Pure-numpy Bowyer-Watson Delaunay (test-only; O(n^2) insertion, fine for
# the n <= 300 clouds used here).
# ---------------------------------------------------------------------------

def _bowyer_watson(points: np.ndarray) -> np.ndarray:
    """Return triangle vertex indices (m, 3) for 2-D ``points``."""
    n = len(points)
    # Super-triangle comfortably containing all points.
    cx, cy = points.mean(axis=0)
    r = float(np.max(np.linalg.norm(points - [cx, cy], axis=1))) * 3 + 1.0
    sup = np.array([[cx - 2 * r, cy - r], [cx + 2 * r, cy - r], [cx, cy + 2 * r]])
    pts = np.vstack([points, sup])
    tris = [(n, n + 1, n + 2)]

    def circumcircle_contains(tri, p):
        a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
        # inCircle determinant (positive for CCW triangle with p inside)
        mat = np.array([
            [a[0] - p[0], a[1] - p[1], (a[0] - p[0]) ** 2 + (a[1] - p[1]) ** 2],
            [b[0] - p[0], b[1] - p[1], (b[0] - p[0]) ** 2 + (b[1] - p[1]) ** 2],
            [c[0] - p[0], c[1] - p[1], (c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2],
        ])
        orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        det = np.linalg.det(mat)
        return det > 0 if orient > 0 else det < 0

    for i in range(n):
        p = pts[i]
        bad = [t for t in tris if circumcircle_contains(t, p)]
        # Polygonal hole boundary = edges of bad triangles not shared twice.
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, c in edge_count.items() if c == 1]
        tris = [t for t in tris if t not in bad]
        for e in boundary:
            tris.append((e[0], e[1], i))
    # Drop triangles touching the super-triangle.
    return np.array([t for t in tris if max(t) < n], dtype=np.int64)


def _reference_gate(lat_deg: np.ndarray, lon_deg: np.ndarray) -> bool:
    """Replay the reference's grid/no-grid DECISION
    (`space_resolution.py:45-74`): dedup, radians, Delaunay, count
    per-triangle edges with cross-axis |delta| < 1e-6 rad; grid iff
    (H + V) >= 1/3 of all edges."""
    latlon = np.unique(np.stack([lat_deg, lon_deg], axis=0), axis=1)
    lat, lon = np.deg2rad(latlon[0]), np.deg2rad(latlon[1])
    if lat.size <= 2:
        return False
    simplices = _bowyer_watson(np.stack([lat, lon], axis=1))
    s0, s1, s2 = simplices[:, 0], simplices[:, 1], simplices[:, 2]
    edges = np.concatenate([
        [lon[s0] - lon[s1], lat[s0] - lat[s1]],
        [lon[s1] - lon[s2], lat[s1] - lat[s2]],
        [lon[s2] - lon[s0], lat[s2] - lat[s0]],
    ], axis=1)
    horizontal = int(np.count_nonzero(np.abs(edges[1]) < 1e-6))
    vertical = int(np.count_nonzero(np.abs(edges[0]) < 1e-6))
    return horizontal + vertical >= edges.shape[1] / 3.0


def _grid(nlat=12, nlon=12, dlat=0.5, dlon=0.5, lat0=10.0, lon0=20.0):
    lats, lons = np.meshgrid(
        lat0 + dlat * np.arange(nlat), lon0 + dlon * np.arange(nlon),
        indexing="ij")
    return lats.ravel(), lons.ravel()


# ---------------------------------------------------------------------------
# Differential decisions: engine vs replayed reference gate.
# ---------------------------------------------------------------------------

SCATTER_CLOUDS = {
    "uniform_random": lambda rng: (rng.uniform(-60, 60, 200),
                                   rng.uniform(-170, 170, 200)),
    "gaussian_clusters": lambda rng: (
        np.concatenate([rng.normal(10, 2, 100), rng.normal(-30, 1, 100)]),
        np.concatenate([rng.normal(40, 3, 100), rng.normal(100, 2, 100)])),
    "ring": lambda rng: (
        30 + 5 * np.sin(rng.uniform(0, 2 * np.pi, 150)),
        -40 + 5 * np.cos(rng.uniform(0, 2 * np.pi, 150))),
    "random_walk": lambda rng: (
        np.cumsum(rng.normal(0, 0.1, 200)) + 45,
        np.cumsum(rng.normal(0, 0.1, 200)) - 100),
}


@pytest.mark.parametrize("name", sorted(SCATTER_CLOUDS))
def test_scatter_cloud_both_reject(name):
    rng = np.random.default_rng(42)
    lat, lon = SCATTER_CLOUDS[name](rng)
    assert detect_latlon_resolution(lat, lon) is None
    assert _reference_gate(lat, lon) is False


def test_regular_grid_both_accept():
    lat, lon = _grid()
    res = detect_latlon_resolution(lat, lon)
    assert res is not None and res.square is not None
    assert _reference_gate(lat, lon) is True


def test_rect_grid_both_accept():
    lat, lon = _grid(dlat=0.25, dlon=1.0)
    res = detect_latlon_resolution(lat, lon)
    assert res is not None and res.lat is not None and res.lon is not None
    assert _reference_gate(lat, lon) is True


def test_subtolerance_jitter_both_accept():
    # Jitter each point by < 1e-6 RADIANS (~5.7e-5 deg): inside the
    # reference's axis-parallel edge tolerance, so both engines must
    # still see the grid. This is exactly the case the engine's
    # tolerance-clustered _axis_edges exists for.
    rng = np.random.default_rng(7)
    lat, lon = _grid(nlat=10, nlon=10)
    jit = np.rad2deg(4e-7)
    lat = lat + rng.uniform(-jit, jit, lat.size)
    lon = lon + rng.uniform(-jit, jit, lon.size)
    res = detect_latlon_resolution(lat, lon)
    assert res is not None and res.square is not None
    assert _reference_gate(lat, lon) is True


def test_heavy_jitter_both_reject():
    # 10% -of-spacing jitter destroys axis-parallel structure for both.
    rng = np.random.default_rng(9)
    lat, lon = _grid(nlat=10, nlon=10)
    lat = lat + rng.uniform(-0.05, 0.05, lat.size)
    lon = lon + rng.uniform(-0.05, 0.05, lon.size)
    assert detect_latlon_resolution(lat, lon) is None
    assert _reference_gate(lat, lon) is False


def test_rows_only_documented_divergence():
    # Points on exact latitude rows with random longitudes: the engine
    # returns None (no vertical spacing), while the reference would
    # compute median([]) -> NaN and emit a NaN-filled resolution
    # (space_resolution.py:80-82 with empty `dlat`). None is the
    # deliberate fixed point; pin it.
    rng = np.random.default_rng(3)
    lat = np.repeat(np.arange(10.0, 15.0, 0.5), 20)
    lon = rng.uniform(0, 10, lat.size)
    assert detect_latlon_resolution(lat, lon) is None


def test_grid_decision_matches_on_sparse_grid():
    # A small 4x4 grid — few points, where gate fractions are most
    # fragile; both must still accept.
    lat, lon = _grid(nlat=4, nlon=4)
    assert detect_latlon_resolution(lat, lon) is not None
    assert _reference_gate(lat, lon) is True


def test_scipy_true_differential_if_available():
    scipy_spatial = pytest.importorskip("scipy.spatial")
    rng = np.random.default_rng(12)
    for name, gen in SCATTER_CLOUDS.items():
        lat, lon = gen(rng)
        latlon = np.unique(np.stack([lat, lon], axis=0), axis=1)
        rl, rn = np.deg2rad(latlon[0]), np.deg2rad(latlon[1])
        tri = scipy_spatial.Delaunay(np.stack([rl, rn], axis=1))
        s = tri.simplices
        edges = np.concatenate([
            [rn[s[:, 0]] - rn[s[:, 1]], rl[s[:, 0]] - rl[s[:, 1]]],
            [rn[s[:, 1]] - rn[s[:, 2]], rl[s[:, 1]] - rl[s[:, 2]]],
            [rn[s[:, 2]] - rn[s[:, 0]], rl[s[:, 2]] - rl[s[:, 0]]],
        ], axis=1)
        h = int(np.count_nonzero(np.abs(edges[1]) < 1e-6))
        v = int(np.count_nonzero(np.abs(edges[0]) < 1e-6))
        ref_grid = h + v >= edges.shape[1] / 3.0
        assert ref_grid is False
        assert detect_latlon_resolution(lat, lon) is None, name
