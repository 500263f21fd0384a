"""kde_cells — brute-force differential (all cells × all points in
Python) incl. cell-boundary points, negative coordinates, and h < 8.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cartwright_ray.stages.hotspot import kde_cells


def _brute(df, h):
    acc = {}
    for r in df.itertuples():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx = r.x // 8 + dx
                cy = r.y // 8 + dy
                d2 = (r.x - (cx * 8 + 4)) ** 2 + (r.y - (cy * 8 + 4)) ** 2
                w = h * h - d2
                if w > 0:
                    acc[(cx, cy)] = acc.get((cx, cy), 0) + w
    rows = [(cx, cy, w) for (cx, cy), w in acc.items()]
    return (pd.DataFrame(rows, columns=["cx", "cy", "kde_w"])
            .sort_values(["cx", "cy"]).reset_index(drop=True))


def _run(df, h):
    t = pa.table({"x": pa.array(df.x.to_numpy(np.int64)),
                  "y": pa.array(df.y.to_numpy(np.int64))})
    ds = ray.data.from_arrow(t).repartition(4)
    return (kde_cells(ds, h=h).to_pandas()
            .sort_values(["cx", "cy"]).reset_index(drop=True))


def test_matches_brute(ray_session):
    rng = np.random.default_rng(41)
    df = pd.DataFrame({"x": rng.integers(-50, 50, 500),
                       "y": rng.integers(-50, 50, 500)})
    # exact cell corners and centers
    df = pd.concat([df, pd.DataFrame({"x": [0, 4, 8, -8, 12],
                                      "y": [0, 4, 8, -8, -4]})],
                   ignore_index=True)
    for h in (8, 5):
        pd.testing.assert_frame_equal(_run(df, h), _brute(df, h),
                                      check_dtype=False)


def test_single_point_center(ray_session):
    # point at a cell center: weight h^2 to its own cell only (d2 to
    # every neighbor center is 64 or 128 >= h^2)
    df = pd.DataFrame({"x": [4], "y": [4]})
    got = _run(df, 8)
    assert got.values.tolist() == [[0, 0, 64]]


def test_surface_gradient_matches_brute_dense_grid():
    """Gradient over a hand-built sparse surface: dense-dict brute
    replay; aspect agrees with the octant of (gx, gy); boundary cells
    see 0 for absent neighbors; layout-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.hotspot import surface_gradient
    from cartwright_ray.stages.tracks import _ROSE_SECTORS, \
        _rose_sector

    rng = np.random.default_rng(13)
    cells = {}
    for _ in range(200):
        cells[(int(rng.integers(-6, 7)),
               int(rng.integers(-6, 7)))] = int(rng.integers(1, 500))
    df = pd.DataFrame([(x, y, w) for (x, y), w in cells.items()],
                      columns=["cx", "cy", "kde_w"])

    rows = []
    for (x, y), w in sorted(cells.items()):
        gx = cells.get((x + 1, y), 0) - cells.get((x - 1, y), 0)
        gy = cells.get((x, y + 1), 0) - cells.get((x, y - 1), 0)
        sec = _rose_sector(np.array([gx]), np.array([gy]))[0]
        aspect = _ROSE_SECTORS[sec] if sec >= 0 else "FLAT"
        rows.append((x, y, w, gx, gy, gx * gx + gy * gy, aspect))
    want = pd.DataFrame(rows, columns=["cx", "cy", "w", "gx", "gy",
                                       "steep2", "aspect"])

    for blocks in (1, 5):
        got = surface_gradient(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # a strictly increasing-east ramp has aspect E at every INTERIOR
    # cell; the last cell faces the implicit-zero edge and falls W
    ramp = pd.DataFrame({"cx": np.arange(5), "cy": 0,
                         "kde_w": 10 * (np.arange(5) + 1)})
    g = surface_gradient(ray.data.from_pandas(ramp))
    interior = g[g.cx < 4]
    assert (interior["aspect"] == "E").all() \
        and (interior["gx"] > 0).all()
    assert g[g.cx == 4]["aspect"].iloc[0] == "W"


def test_distance_transform_matches_brute():
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.hotspot import distance_transform_cells

    rng = np.random.default_rng(29)
    lat = rng.integers(-10, 11, 400) + 0.5
    lon = rng.integers(-10, 11, 400) + 0.5
    df = pd.DataFrame({"lat": lat.astype(float),
                       "lon": lon.astype(float)})

    occ = set(zip(np.floor(lon).astype(int), np.floor(lat).astype(int)))
    want = {}
    for (x, y) in occ:
        for dx in range(-3, 4):
            for dy in range(-3, 4):
                key = (x + dx, y + dy)
                d2 = dx * dx + dy * dy
                want[key] = min(want.get(key, 99), d2)
    want = pd.DataFrame([(x, y, d) for (x, y), d in sorted(want.items())],
                        columns=["cx", "cy", "d2min"])

    for blocks in (1, 5):
        got = distance_transform_cells(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # occupied cells are exactly the zero set
    zero = set(map(tuple, got[got.d2min == 0][["cx", "cy"]]
                   .to_numpy()))
    assert zero == occ
