"""rasterize_polygons — brute PIP differential on a toy polygon set,
center-burn semantics, multi-ring dedup."""

import numpy as np
import pandas as pd

from cartwright_ray.geo.pip import points_in_polygon
from cartwright_ray.joins.rasterize import rasterize_polygons


def test_matches_brute_center_burn():
    polys = [
        {"admin_id": "T0", "name": "square",
         "ring_lat": [0.0, 0.0, 4.0, 4.0],
         "ring_lon": [0.0, 5.0, 5.0, 0.0]},
        {"admin_id": "T1", "name": "triangle",
         "ring_lat": [-3.0, -3.0, 1.5],
         "ring_lon": [-4.0, 2.0, -1.0]},
        # two rings, one admin (the antimeridian convention)
        {"admin_id": "T2", "name": "east",
         "ring_lat": [10.0, 10.0, 12.0, 12.0],
         "ring_lon": [178.0, 180.0, 180.0, 178.0]},
        {"admin_id": "T2", "name": "west",
         "ring_lat": [10.0, 10.0, 12.0, 12.0],
         "ring_lon": [-180.0, -178.0, -178.0, -180.0]},
    ]
    got = rasterize_polygons(polys, cells_per_deg=2, parallelism=8)

    # brute: every 0.5-degree center against every ring
    nx, ny = 720, 360
    i = np.arange(nx * ny)
    cx = i % nx - nx // 2
    cy = i // nx - ny // 2
    lat = cy / 2 + 0.25
    lon = cx / 2 + 0.25
    rows = set()
    for p in polys:
        m = points_in_polygon(lat, lon, np.array(p["ring_lat"]),
                              np.array(p["ring_lon"]))
        for a, b in zip(cx[m], cy[m]):
            rows.add((p["admin_id"], int(a), int(b)))
    want = pd.DataFrame(sorted(rows),
                        columns=["admin_id", "cx", "cy"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # burn-rule sanity: the 5x4-degree square burns 10x8 half-degree
    # cells (centers strictly inside; edges excluded by the center rule)
    assert (got.admin_id == "T0").sum() == 10 * 8
    # both antimeridian rings contribute under one admin_id
    t2 = got[got.admin_id == "T2"]
    assert (t2.cx < 0).any() and (t2.cx > 0).any()
