"""Box-overlap join (joins/box_join.py): broadcast and shuffle plans
against the brute-force oracle, reference-point dedup uniqueness, and
edge semantics."""

import numpy as np
import pyarrow as pa
import pytest

from cartwright_ray.joins.box_join import (box_join, box_join_shuffle,
                                           brute_force_box_join)


def _boxes(n, seed, max_w=12.0, prefix="X"):
    rng = np.random.default_rng(seed)
    lat0 = rng.uniform(-88, 80, n)
    lon0 = rng.uniform(-178, 160, n)
    h = rng.uniform(0.5, max_w, n)
    w = rng.uniform(0.5, max_w, n)
    return {"box_id": np.array([f"{prefix}{i:04d}" for i in range(n)],
                               dtype=object),
            "lat0": lat0, "lat1": np.minimum(lat0 + h, 90.0),
            "lon0": lon0, "lon1": np.minimum(lon0 + w, 180.0)}


def _ds(ray, b, nblocks=4):
    import ray.data
    return ray.data.from_arrow(pa.table(
        {k: pa.array(list(v)) for k, v in b.items()})).repartition(nblocks)


def _pairs(out_ds):
    df = out_ds.to_pandas()
    return sorted(zip(df["a_id"], df["b_id"]))


def test_broadcast_matches_brute_force(ray_session):
    a, b = _boxes(300, 1, prefix="A"), _boxes(60, 2, prefix="B")
    got = _pairs(box_join(_ds(ray_session, a), b))
    assert got == brute_force_box_join(a, b)


@pytest.mark.parametrize("cell_deg", [8.0, 15.0, 45.0])
def test_shuffle_matches_brute_force(ray_session, cell_deg):
    a, b = _boxes(250, 3, prefix="A"), _boxes(120, 4, prefix="B")
    got = _pairs(box_join_shuffle(_ds(ray_session, a),
                                  _ds(ray_session, b), cell_deg=cell_deg))
    want = brute_force_box_join(a, b)
    assert got == want          # equality ⇒ no duplicates AND no misses


def test_touching_edges_overlap(ray_session):
    a = {"box_id": np.array(["a"], object), "lat0": np.array([0.0]),
         "lat1": np.array([10.0]), "lon0": np.array([0.0]),
         "lon1": np.array([10.0])}
    b = {"box_id": np.array(["b"], object), "lat0": np.array([10.0]),
         "lat1": np.array([20.0]), "lon0": np.array([10.0]),
         "lon1": np.array([20.0])}
    assert _pairs(box_join(_ds(ray_session, a, 1), b)) == [("a", "b")]
    assert _pairs(box_join_shuffle(_ds(ray_session, a, 1),
                                   _ds(ray_session, b, 1))) == [("a", "b")]


def test_shuffle_edge_of_world(ray_session):
    """Boxes reaching exactly lat 90 / lon 180 (and a degenerate box
    starting there) survive the clamps."""
    a = {"box_id": np.array(["top", "deg"], object),
         "lat0": np.array([85.0, 90.0]), "lat1": np.array([90.0, 90.0]),
         "lon0": np.array([170.0, 180.0]), "lon1": np.array([180.0, 180.0])}
    b = {"box_id": np.array(["bb"], object), "lat0": np.array([88.0]),
         "lat1": np.array([90.0]), "lon0": np.array([175.0]),
         "lon1": np.array([180.0])}
    got = _pairs(box_join_shuffle(_ds(ray_session, a, 1),
                                  _ds(ray_session, b, 1), cell_deg=8.0))
    assert got == brute_force_box_join(a, b)


def test_spanning_boxes_still_dedupe(ray_session):
    """Boxes far larger than a cell produce many co-located copies but
    exactly one emitted pair."""
    a = {"box_id": np.array(["big"], object), "lat0": np.array([-60.0]),
         "lat1": np.array([60.0]), "lon0": np.array([-120.0]),
         "lon1": np.array([120.0])}
    b = {"box_id": np.array(["small"], object), "lat0": np.array([1.0]),
         "lat1": np.array([2.0]), "lon0": np.array([3.0]),
         "lon1": np.array([4.0])}
    got = _pairs(box_join_shuffle(_ds(ray_session, a, 1),
                                  _ds(ray_session, b, 1), cell_deg=8.0))
    assert got == [("big", "small")]
