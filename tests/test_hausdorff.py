"""hausdorff_join — brute-force differential + prefilter soundness.

The brute oracle computes symmetric Hausdorff² for EVERY user pair
(no bbox prefilter) with a plain double loop; the joined result must
equal its ≤T² subset at any block layout — which simultaneously proves
the expanded-bbox prefilter never drops a qualifying pair. Plus: the
directed kernel against scipy-free hand values, and duplicate points /
single-point tracks.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.joins.hausdorff_join import (_h2_directed,
                                                 hausdorff_join)


def _brute(df, t2):
    pts = {u: (g["x"].to_numpy(np.int64), g["y"].to_numpy(np.int64))
           for u, g in df.groupby("user_id")}
    users = sorted(pts)
    rows = []
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            h2 = max(_h2_directed(*pts[a], *pts[b]),
                     _h2_directed(*pts[b], *pts[a]))
            if h2 <= t2:
                rows.append((a, b, h2))
    return pd.DataFrame(rows, columns=["user_a", "user_b", "h2"])


def test_matches_brute_and_layout_invariant():
    rng = np.random.default_rng(53)
    n = 600
    # clustered arenas: users 0-4 around origin, 5-9 offset by ~10,
    # 10-11 far away -> a mix of close, borderline and excluded pairs
    u = rng.integers(0, 12, n).astype(np.int64)
    base = np.where(u < 5, 0, np.where(u < 10, 10, 200))
    df = pd.DataFrame({
        "user_id": u, "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
        "x": base + rng.integers(0, 15, n),
        "y": base + rng.integers(0, 15, n)})
    want = _brute(df, 18 * 18)
    assert 3 < len(want) < 66          # some pairs in, some out
    for blocks in (1, 5, 19):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (hausdorff_join(ds, threshold=18).to_pandas()
               .sort_values(["user_a", "user_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_directed_kernel_hand_values():
    ax = np.array([0, 4], np.int64)
    ay = np.array([0, 0], np.int64)
    bx = np.array([0, 4], np.int64)
    by = np.array([3, 0], np.int64)
    # A->B: point (0,0) min dist² = 9 (to (0,3)); (4,0) -> 0; h=9
    assert _h2_directed(ax, ay, bx, by) == 9
    # B->A: (0,3) min 9, (4,0) min 0 -> 9
    assert _h2_directed(bx, by, ax, ay) == 9
    # identical sets -> 0
    assert _h2_directed(ax, ay, ax, ay) == 0


def test_single_point_and_duplicate_tracks():
    df = pd.DataFrame({
        "user_id": np.array([0, 1, 1, 1, 2], np.int64),
        "event_id": np.arange(5, dtype=np.int64),
        "ts": np.arange(5, dtype=np.int64),
        "x": np.array([0, 0, 0, 1, 5], np.int64),
        "y": np.array([0, 0, 0, 0, 0], np.int64)})
    got = (hausdorff_join(ray.data.from_pandas(df), threshold=10)
           .to_pandas().sort_values(["user_a", "user_b"])
           .reset_index(drop=True))
    want = _brute(df, 100)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # 0 vs 1: h² = 1 (point (1,0) of track 1 is 1 away)
    assert got.set_index(["user_a", "user_b"]).loc[(0, 1), "h2"] == 1
