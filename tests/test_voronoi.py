"""voronoi_counts — brute-force differential + zero-load sites +
tie-break determinism at any block layout."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.joins.voronoi import voronoi_counts


def _brute(pts, sites):
    px = np.rint(pts["lon"].to_numpy() * 8).astype(np.int64)
    py = np.rint(pts["lat"].to_numpy() * 8).astype(np.int64)
    sid = sites["site_id"].to_numpy()
    sx = np.rint(sites["lon"].to_numpy() * 8).astype(np.int64)
    sy = np.rint(sites["lat"].to_numpy() * 8).astype(np.int64)
    counts = {int(s): 0 for s in sid}
    for x, y in zip(px, py):
        d2 = (x - sx) ** 2 + (y - sy) ** 2
        best = min(zip(d2, sid))[1]          # tie-break: smallest id
        counts[int(best)] += 1
    return pd.DataFrame(sorted(counts.items()),
                        columns=["site_id", "n_points"])


def test_matches_brute_with_ties_and_empty_sites():
    rng = np.random.default_rng(5)
    pts = pd.DataFrame({
        "lat": rng.integers(-80, 81, 3000) * 0.125,
        "lon": rng.integers(-160, 161, 3000) * 0.125})
    # site 7 and 9 are equidistant mirrors of many lattice points
    # (tie-break coverage); site 99 is far away (zero load)
    sites = pd.DataFrame({
        "site_id": [7, 9, 3, 99],
        "lat": [2.0, -2.0, 5.0, 89.0],
        "lon": [0.0, 0.0, 8.0, 179.0]})
    want = _brute(pts, sites)
    for blocks in (1, 6):
        got = voronoi_counts(
            ray.data.from_pandas(pts).repartition(blocks), sites)
        pd.testing.assert_frame_equal(got, want)
    assert (want.set_index("site_id").loc[99, "n_points"] == 0)
    assert want["n_points"].sum() == len(pts)
