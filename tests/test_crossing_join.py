"""crossing_join — brute-force differential over random integer tracks.

The brute oracle enumerates ALL cross-user segment pairs (O(n²), no
cells) with the same strict proper-intersection predicate; the
cell-bucketed owner-claimed join must match exactly at any block
layout. The fixture mixes short hops with long chords so pairs span
multiple shared cells (exercising the owner-cell dedup), and the
integer grid guarantees collinear/touching cases that must NOT count.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.joins.crossing_join import (_proper_intersect,
                                                crossing_join)


def _brute(df):
    segs = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        for k in range(1, len(g)):
            segs.append((u, x[k - 1], y[k - 1], x[k], y[k]))
    counts = {}
    for a in range(len(segs)):
        for b in range(len(segs)):
            ua, ax1, ay1, ax2, ay2 = segs[a]
            ub, bx1, by1, bx2, by2 = segs[b]
            if ua >= ub:
                continue
            if _proper_intersect(np.int64(ax1), np.int64(ay1),
                                 np.int64(ax2), np.int64(ay2),
                                 np.int64(bx1), np.int64(by1),
                                 np.int64(bx2), np.int64(by2)):
                counts[(ua, ub)] = counts.get((ua, ub), 0) + 1
    return (pd.DataFrame([(a, b, n) for (a, b), n in sorted(counts.items())],
                         columns=["user_a", "user_b", "n_crossings"]))


def test_matches_brute_and_layout_invariant():
    rng = np.random.default_rng(47)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 8, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
        # mix: a shared 40x40 arena so tracks crisscross; ~long chords
        "x": rng.integers(-20, 20, n).astype(np.int64),
        "y": rng.integers(-20, 20, n).astype(np.int64)})
    want = _brute(df)
    assert len(want) > 5
    assert want["n_crossings"].max() > 3
    for blocks in (1, 4, 17):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (crossing_join(ds).to_pandas()
               .sort_values(["user_a", "user_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_colocation_matches_brute():
    from cartwright_ray.joins.crossing_join import colocation_join
    rng = np.random.default_rng(59)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 10, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 20, n) * 3_600_000_000
                             + rng.integers(0, 3_600_000_000, n),
                             unit="us"),
        "x": rng.integers(-20, 20, n).astype(np.int64),
        "y": rng.integers(-20, 20, n).astype(np.int64)})
    pres = set()
    for _, r in df.iterrows():
        b = (r["ts"].value // 1000) // 3_600_000_000
        pres.add((int(r["user_id"]), int(r["x"]) // 8,
                  int(r["y"]) // 8, int(b)))
    counts = {}
    for (u1, cx1, cy1, b1) in pres:
        for (u2, cx2, cy2, b2) in pres:
            if u1 < u2 and (cx1, cy1, b1) == (cx2, cy2, b2):
                counts[(u1, u2)] = counts.get((u1, u2), 0) + 1
    want = (pd.DataFrame([(a, b, c) for (a, b), c in sorted(counts.items())],
                         columns=["user_a", "user_b", "n_slots"]))
    assert len(want) > 10
    for blocks in (1, 6):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (colocation_join(ds).to_pandas()
               .sort_values(["user_a", "user_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_proper_only_excludes_touch_and_collinear():
    z = np.int64
    # X-crossing: proper
    assert _proper_intersect(z(0), z(0), z(4), z(4), z(0), z(4), z(4), z(0))
    # T-touch: endpoint of B lies ON A — not proper
    assert not _proper_intersect(z(0), z(0), z(4), z(0),
                                 z(2), z(0), z(2), z(3))
    # collinear overlap — not proper
    assert not _proper_intersect(z(0), z(0), z(4), z(0),
                                 z(2), z(0), z(6), z(0))
    # shared endpoint — not proper
    assert not _proper_intersect(z(0), z(0), z(4), z(4),
                                 z(4), z(4), z(8), z(0))
    # parallel disjoint — no
    assert not _proper_intersect(z(0), z(0), z(4), z(0),
                                 z(0), z(1), z(4), z(1))


def test_hot_cell_skew_still_exact():
    """Adversarial skew: 60% of all segments live inside ONE cell (the
    documented m² hot-cell surface). Result must stay exact — the
    skew costs time, never correctness — and multi-cell long chords
    crossing into the hot cell must still dedup to one count via the
    owner-cell claim."""
    rng = np.random.default_rng(83)
    n = 300
    hot = rng.random(n) < 0.6
    x = np.where(hot, rng.integers(0, 8, n),
                 rng.integers(-40, 40, n)).astype(np.int64)
    y = np.where(hot, rng.integers(0, 8, n),
                 rng.integers(-40, 40, n)).astype(np.int64)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 6, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 500, n).astype(np.int64),
        "x": x, "y": y})
    want = _brute(df)
    assert len(want) > 3
    got = (crossing_join(ray.data.from_pandas(df).repartition(5))
           .to_pandas().sort_values(["user_a", "user_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # and with the quadtree refinement FORCED onto the hot cell
    # (threshold 50 < its ~180 segments): identical result
    got_r = (crossing_join(ray.data.from_pandas(df).repartition(5),
                           hot_cell_rows=50)
             .to_pandas().sort_values(["user_a", "user_b"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_r, want, check_dtype=False)


def test_refinement_exact_at_any_threshold_and_factor():
    """Quadtree hot-cell refinement is a physical-plan property only:
    forcing EVERY cell hot (threshold 0) at each refine factor, at two
    block layouts, must reproduce the brute result bit-for-bit —
    including long chords whose clipped bboxes span many subcells."""
    rng = np.random.default_rng(131)
    n = 250
    df = pd.DataFrame({
        "user_id": rng.integers(0, 7, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 800, n).astype(np.int64),
        "x": rng.integers(-24, 24, n).astype(np.int64),
        "y": rng.integers(-24, 24, n).astype(np.int64)})
    want = _brute(df)
    assert len(want) > 5
    for refine in (2, 4, 8):
        for blocks in (1, 9):
            ds = ray.data.from_pandas(df).repartition(blocks)
            got = (crossing_join(ds, hot_cell_rows=0, refine=refine)
                   .to_pandas().sort_values(["user_a", "user_b"])
                   .reset_index(drop=True))
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
