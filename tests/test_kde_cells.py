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
