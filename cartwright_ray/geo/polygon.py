"""Spherical polygon measures — area and centroid, vectorized numpy.

Area uses the classic spherical-excess line-integral approximation for
geodesic polygons (Chamberlain & Duquette, "Some algorithms for polygons
on a sphere", JPL 2007):

    A = | R^2 / 2 * sum_i (lam_{i+1} - lam_i) * (2 + sin(phi_i)
                                                 + sin(phi_{i+1})) | / 2

exact for lat/lon-aligned rectangles and accurate to O((size/R)^2) for
the admin-polygon scale. Longitude differences are wrapped to (-180,
180] so antimeridian-crossing rings measure correctly. The centroid is
the area-weighted planar centroid of the ring in lat/lon space (the
standard cartographic label point; NOT the spherical center of mass —
fine for polygons far from the poles, documented trade-off).
"""

from __future__ import annotations

import numpy as np

from .haversine import EARTH_RADIUS_KM


def polygon_area_km2(ring_lat, ring_lon) -> float:
    """Area of one ring (vertices in order, closure optional) in km^2."""
    lat = np.asarray(ring_lat, dtype=np.float64)
    lon = np.asarray(ring_lon, dtype=np.float64)
    lat2 = np.roll(lat, -1)
    lon2 = np.roll(lon, -1)
    dlon = (lon2 - lon + 180.0) % 360.0 - 180.0      # wrap antimeridian
    phi1 = np.deg2rad(lat)
    phi2 = np.deg2rad(lat2)
    # the "2 +" terms cancel over any closed ring whose wrapped dlon sums
    # to 0; for a rectangle the side edges drop out and |s| * R^2 / 2
    # equals the analytic band area R^2 * dlam * (sin p2 - sin p1)
    # exactly. LIMITATION: a pole-ENCIRCLING ring's +-360 winding wraps
    # to 0, so such rings measure 0 — split them at a meridian first
    # (same convention the PIP layer uses for the antimeridian)
    s = np.sum(np.deg2rad(dlon) * (2.0 + np.sin(phi1) + np.sin(phi2)))
    return float(abs(s) * EARTH_RADIUS_KM ** 2 / 2.0)


def polygon_centroid(ring_lat, ring_lon) -> tuple[float, float]:
    """(lat, lon) planar shoelace centroid of the ring; degenerate
    (zero-area) rings fall back to the vertex mean."""
    lat = np.asarray(ring_lat, dtype=np.float64)
    lon = np.asarray(ring_lon, dtype=np.float64)
    x, y = lon, lat
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    cross = x * y2 - x2 * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:
        return float(lat.mean()), float(lon.mean())
    cx = ((x + x2) * cross).sum() / (6.0 * a)
    cy = ((y + y2) * cross).sum() / (6.0 * a)
    return float(cy), float(cx)
