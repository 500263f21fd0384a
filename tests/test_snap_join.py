"""snap_to_segments — brute-force all-segments differential with the
same rational-distance branches, radius filtering, tie-breaks, and
degenerate (zero-length) segments.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cartwright_ray.joins.snap_join import snap_to_segments


def _brute(points, segs, rmax):
    rows = []
    for pid, px, py in points:
        best = None
        for rid, ax, ay, bx, by in segs:
            dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
            len2 = (bx - ax) ** 2 + (by - ay) ** 2
            ap2 = (px - ax) ** 2 + (py - ay) ** 2
            bp2 = (px - bx) ** 2 + (py - by) ** 2
            if 0 < dot < len2:
                d2 = float(ap2 * len2 - dot * dot) / float(len2)
            elif dot <= 0:
                d2 = float(ap2)
            else:
                d2 = float(bp2)
            if d2 <= rmax * rmax and (best is None or (d2, rid) < best):
                best = (d2, rid)
        if best is not None:
            rows.append((pid, best[1], best[0]))
    return (pd.DataFrame(rows, columns=["event_id", "road_id",
                                        "snap_d2"])
            .sort_values("event_id").reset_index(drop=True))


def _run(points, segs, rmax):
    pt = pa.table({"event_id": pa.array([p[0] for p in points],
                                        pa.int64()),
                   "x": pa.array([p[1] for p in points], pa.int64()),
                   "y": pa.array([p[2] for p in points], pa.int64())})
    st = pa.table({"road_id": pa.array([s[0] for s in segs], pa.int64()),
                   "x1": pa.array([s[1] for s in segs], pa.int64()),
                   "y1": pa.array([s[2] for s in segs], pa.int64()),
                   "x2": pa.array([s[3] for s in segs], pa.int64()),
                   "y2": pa.array([s[4] for s in segs], pa.int64())})
    ds = ray.data.from_arrow(pt).repartition(4)
    res = snap_to_segments(ds, st, rmax=rmax)
    df = res.to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["event_id", "road_id", "snap_d2"])
    return df.sort_values("event_id").reset_index(drop=True)


def test_matches_brute(ray_session):
    rng = np.random.default_rng(31)
    points = [(i, int(rng.integers(-100, 100)),
               int(rng.integers(-100, 100))) for i in range(400)]
    segs = []
    for r in range(12):
        ax, ay = int(rng.integers(-90, 90)), int(rng.integers(-90, 90))
        segs.append((r, ax, ay, ax + int(rng.integers(-60, 60)),
                     ay + int(rng.integers(-60, 60))))
    segs.append((12, 5, 5, 5, 5))          # degenerate point-segment
    segs.append((13, -50, 0, 50, 0))       # long horizontal chord
    got = _run(points, segs, 8)
    exp = _brute(points, segs, 8)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tie_breaks_on_road_id(ray_session):
    # two parallel segments equidistant from the point: lower road_id
    segs = [(7, -10, 4, 10, 4), (3, -10, -4, 10, -4)]
    got = _run([(1, 0, 0)], segs, 8)
    assert got.road_id.tolist() == [3] and got.snap_d2.tolist() == [16.0]


def test_radius_excludes(ray_session):
    got = _run([(1, 0, 0)], [(0, 100, 100, 120, 100)], 8)
    assert got.empty
