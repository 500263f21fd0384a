"""track_extent — exact per-track bbox + farthest-pair diameter via
hull-of-hulls candidate reduction.

The brute O(n²) pairwise max IS the spec (integer coordinates make it
bit-exact); the distributed result must match at any block layout, and
the candidate pruning must survive the adversarial geometries: all
points collinear (vertical / horizontal / diagonal), duplicated points,
single-point tracks, and convex-position inputs where nothing prunes.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.tracks import track_extent, _chain_candidates


def _brute(df):
    rows = []
    for u, g in df.groupby("u"):
        x = np.rint(g["lon"].to_numpy() * 8).astype(np.int64)
        y = np.rint(g["lat"].to_numpy() * 8).astype(np.int64)
        dx = x[:, None] - x
        dy = y[:, None] - y
        rows.append((u, x.min(), x.max(), y.min(), y.max(),
                     (dx * dx + dy * dy).max()))
    return pd.DataFrame(rows, columns=["u", "xmin", "xmax", "ymin",
                                       "ymax", "diam2"])


def _run(df, blocks):
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = track_extent(ds, track_col="u", scale=8).to_pandas()
    return out.sort_values("u").reset_index(drop=True)


def test_matches_brute_random_layout_invariant():
    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "u": rng.integers(0, 12, n),
        "lat": rng.integers(-600, 600, n) / 8.0,
        "lon": rng.integers(-1200, 1200, n) / 8.0})
    want = _brute(df).sort_values("u").reset_index(drop=True)
    for blocks in (1, 3, 17):
        got = _run(df, blocks)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_degenerate_geometries():
    frames = [
        pd.DataFrame({"u": 0, "lat": [3.0], "lon": [4.0]}),       # single
        pd.DataFrame({"u": 1, "lat": [1.0] * 5,                    # horiz
                      "lon": [0.0, 1.0, 2.0, 3.0, 4.0]}),
        pd.DataFrame({"u": 2, "lat": [0.0, 1.0, 2.0, 3.0],         # vert
                      "lon": [7.0] * 4}),
        pd.DataFrame({"u": 3, "lat": [0.0, 1.0, 2.0, 3.0],         # diag
                      "lon": [0.0, 1.0, 2.0, 3.0]}),
        pd.DataFrame({"u": 4, "lat": [5.0] * 6, "lon": [5.0] * 6}),  # dups
    ]
    df = pd.concat(frames, ignore_index=True)
    want = _brute(df).sort_values("u").reset_index(drop=True)
    for blocks in (1, 4):
        got = _run(df, blocks)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert int(got.loc[got["u"] == 0, "diam2"].iloc[0]) == 0
    assert int(got.loc[got["u"] == 4, "diam2"].iloc[0]) == 0


def test_convex_position_nothing_prunes():
    # points on a circle: every point is a hull vertex; the pruner must
    # terminate (one clean pass) and keep the exact diameter
    t = np.arange(40) * (2 * np.pi / 40)
    x = np.rint(100 * np.cos(t)).astype(np.int64)
    y = np.rint(100 * np.sin(t)).astype(np.int64)
    df = pd.DataFrame({"u": 0, "lat": y / 8.0, "lon": x / 8.0})
    got = _run(df, 3)
    want = _brute(df)
    assert int(got["diam2"].iloc[0]) == int(want["diam2"].iloc[0])


def test_chain_candidates_superset_of_hull_extremes():
    rng = np.random.default_rng(9)
    x = rng.integers(-50, 50, 200).astype(np.int64)
    y = rng.integers(-50, 50, 200).astype(np.int64)
    k = np.zeros(200, np.int64)
    order = np.lexsort((y, x, k))
    x, y = x[order], y[order]
    keep = _chain_candidates(k, x, y)
    assert x[keep].min() == x.min() and x[keep].max() == x.max()
    assert y[keep].min() == y.min() and y[keep].max() == y.max()
    dx = x[:, None] - x
    dy = y[:, None] - y
    full = (dx * dx + dy * dy).max()
    xc, yc = x[keep], y[keep]
    dxc = xc[:, None] - xc
    dyc = yc[:, None] - yc
    assert (dxc * dxc + dyc * dyc).max() == full
    assert keep.sum() < 60                   # it actually pruned


def test_track_sinuosity_matches_brute_any_layout():
    """L1 sinuosity: brute per-user pandas replay, exact at any block
    layout; loops (net == 0) take the 0.0 sentinel; straight-line
    tracks have sinuosity exactly 1.0."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.tracks import track_sinuosity

    rng = np.random.default_rng(11)
    rows = []
    for u in range(40):
        n = int(rng.integers(1, 30))
        xs = np.cumsum(rng.integers(-4, 5, n)) * 0.125
        ys = np.cumsum(rng.integers(-4, 5, n)) * 0.125
        ts = np.sort(rng.integers(0, 10_000, n))
        for i in range(n):
            rows.append((u, int(ts[i]), u * 1000 + i,
                         float(ys[i]), float(xs[i])))
    # user 100: an exact loop (net 0); user 101: a straight line
    rows += [(100, t, 100_000 + t, 0.0, [0, 1, 1, 0][t] * 0.125)
             for t in range(4)]
    rows += [(101, t, 101_000 + t, 0.0, t * 0.25) for t in range(5)]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "lat", "lon"])

    def brute(g):
        g = g.sort_values(["ts", "event_id"])
        ix = np.rint(g["lon"].to_numpy() * 8).astype(np.int64)
        iy = np.rint(g["lat"].to_numpy() * 8).astype(np.int64)
        path = int(np.abs(np.diff(ix)).sum()
                   + np.abs(np.diff(iy)).sum())
        net = int(abs(ix[-1] - ix[0]) + abs(iy[-1] - iy[0]))
        return pd.Series({"n_pings": len(g), "l1_path": path,
                          "l1_net": net,
                          "sinuosity": path / net if net else 0.0})

    want = (df.groupby("user_id").apply(brute, include_groups=False)
            .reset_index())
    for c in ["n_pings", "l1_path", "l1_net"]:
        want[c] = want[c].astype("int64")

    for blocks in (1, 7):
        # ts as timestamp column too: the kernel casts either way
        d2 = df.copy()
        d2["ts"] = pd.to_datetime(d2["ts"], unit="s")
        got = track_sinuosity(
            ray.data.from_pandas(d2).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    loop = want[want.user_id == 100].iloc[0]
    straight = want[want.user_id == 101].iloc[0]
    assert loop.sinuosity == 0.0 and loop.l1_path > 0
    assert straight.sinuosity == 1.0


def test_direction_rose_octants_match_atan2():
    """The ordered integer cascade must agree with the half-open
    [k·45°, (k+1)·45°) octant of atan2 for every step vector in a
    dense lattice, and the distributed counts must match a brute
    groupby at any layout."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.tracks import _ROSE_SECTORS, \
        _rose_sector, direction_rose

    g = np.arange(-5, 6)
    dx, dy = np.meshgrid(g, g)
    dx, dy = dx.ravel(), dy.ravel()
    nz = (dx != 0) | (dy != 0)
    dx, dy = dx[nz], dy[nz]
    sec = _rose_sector(dx, dy)
    ang = np.degrees(np.arctan2(dy, dx)) % 360.0
    want = (ang // 45).astype(int) % 8
    assert (sec == want).all()

    rng = np.random.default_rng(21)
    rows = []
    for u in range(25):
        n = int(rng.integers(2, 40))
        xs = np.cumsum(rng.integers(-3, 4, n)) * 0.125
        ys = np.cumsum(rng.integers(-3, 4, n)) * 0.125
        for i in range(n):
            rows.append((u, i, u * 100 + i, float(ys[i]),
                         float(xs[i])))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "lat", "lon"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")

    brute = {}
    for u, g2 in df.groupby("user_id"):
        g2 = g2.sort_values(["ts", "event_id"])
        ix = np.rint(g2["lon"].to_numpy() * 8).astype(np.int64)
        iy = np.rint(g2["lat"].to_numpy() * 8).astype(np.int64)
        s = _rose_sector(np.diff(ix), np.diff(iy))
        for v in s[s >= 0]:
            key = (u, _ROSE_SECTORS[v])
            brute[key] = brute.get(key, 0) + 1
    want_df = pd.DataFrame(
        [(u, s, n) for (u, s), n in sorted(brute.items())],
        columns=["user_id", "sector", "n_steps"])

    for blocks in (1, 4):
        got = direction_rose(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


def test_deviational_ellipse_matches_numpy_eig():
    """SDE per track: the closed-form orientation/axis variances must
    match an eigendecomposition of the covariance matrix; degenerate
    (collinear) tracks give var_min == 0."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.tracks import deviational_ellipse

    rng = np.random.default_rng(61)
    rows = []
    for u in range(20):
        n = int(rng.integers(3, 50))
        # anisotropic cloud rotated per user
        ang = rng.uniform(0, np.pi)
        major = rng.integers(-40, 41, n)
        minor = rng.integers(-8, 9, n)
        x = np.rint(major * np.cos(ang) - minor * np.sin(ang))
        y = np.rint(major * np.sin(ang) + minor * np.cos(ang))
        for xi, yi in zip(x, y):
            rows.append((u, yi * 0.125, xi * 0.125))
    # user 99: exactly collinear
    rows += [(99, 0.0, i * 0.125) for i in range(5)]
    df = pd.DataFrame(rows, columns=["user_id", "lat", "lon"])

    runs = [deviational_ellipse(ray.data.from_pandas(df)
                                .repartition(b)) for b in (1, 6)]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    got = runs[0]

    for _, r in got.iterrows():
        g = df[df.user_id == r.user_id]
        x = np.rint(g.lon.to_numpy() * 8)
        y = np.rint(g.lat.to_numpy() * 8)
        cov = np.cov(np.stack([x, y]), bias=True)
        ev = np.sort(np.linalg.eigvalsh(cov))
        assert abs(r.var_maj - ev[1]) < 1e-6 * max(1, ev[1])
        assert abs(r.var_min - ev[0]) < 1e-6 * max(1, ev[1])
        assert abs(r.cx - x.mean()) < 1e-9
        # orientation: the major eigenvector angle (mod pi), only
        # meaningful when anisotropic
        if ev[1] > ev[0] * 1.01 and len(g) > 3:
            w, v = np.linalg.eigh(cov)
            vec = v[:, np.argmax(w)]
            want = np.arctan2(vec[1], vec[0]) % np.pi
            gotang = (2 * r.theta / 2) % np.pi
            d = abs(want - gotang) % np.pi
            assert min(d, np.pi - d) < 1e-5

    coll = got[got.user_id == 99].iloc[0]
    assert coll.var_min == 0.0 and coll.var_maj > 0
