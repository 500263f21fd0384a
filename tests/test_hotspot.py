"""getis_ord_cells — brute-force differential + invariants.

The brute oracle recomputes Gi* per occupied cell directly from the
formula (dict lookups, Python floats); the distributed scatter-9 +
groupby result must match bit-exactly at any block layout. Invariants:
a dense cluster's center cell carries the maximum z; an exactly-uniform
fully-occupied grid has zero variance and every z is 0.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.hotspot import getis_ord_cells


def _brute(df):
    cx = np.floor(df["lon"].to_numpy()).astype(np.int64)
    cy = np.floor(df["lat"].to_numpy()).astype(np.int64)
    counts = {}
    for a, b in zip(cx, cy):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    xmin, xmax = min(a for a, _ in counts), max(a for a, _ in counts)
    ymin, ymax = min(b for _, b in counts), max(b for _, b in counts)
    n = (xmax - xmin + 1) * (ymax - ymin + 1)
    sx = sum(counts.values())
    sxx = sum(v * v for v in counts.values())
    xbar = float(sx) / float(n)
    s2 = float(sxx) / float(n) - xbar * xbar
    rows = []
    for (a, b), x in sorted(counts.items()):
        wsum = sum(counts.get((a + dx, b + dy), 0)
                   for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        w = float((min(a + 1, xmax) - max(a - 1, xmin) + 1)
                  * (min(b + 1, ymax) - max(b - 1, ymin) + 1))
        if n < 2 or not (s2 > 0.0):
            z = 0.0
        else:
            den = np.sqrt(s2) * np.sqrt((float(n) * w - w * w)
                                        / float(n - 1))
            z = (float(wsum) - xbar * w) / den if den > 0 else 0.0
        rows.append((a, b, x, z))
    return pd.DataFrame(rows, columns=["cx", "cy", "x", "gi_z"])


def test_matches_brute_and_layout_exact():
    rng = np.random.default_rng(19)
    # background noise + a dense cluster around (10.5, 20.5)
    lat = np.r_[rng.uniform(0, 30, 2000), rng.normal(10.5, 0.8, 600)]
    lon = np.r_[rng.uniform(0, 30, 2000), rng.normal(20.5, 0.8, 600)]
    df = pd.DataFrame({"lat": lat, "lon": lon})
    want = _brute(df)
    runs = []
    for blocks in (1, 4, 19):
        ds = ray.data.from_pandas(df).repartition(blocks)
        runs.append(getis_ord_cells(ds))
    for got in runs:
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the cluster center is the global hotspot
    top = want.loc[want["gi_z"].idxmax()]
    assert (top["cx"], top["cy"]) == (20, 10)
    assert top["gi_z"] > 5.0


def _brute_morans(df):
    cx = np.floor(df["lon"].to_numpy()).astype(np.int64)
    cy = np.floor(df["lat"].to_numpy()).astype(np.int64)
    counts = {}
    for a, b in zip(cx, cy):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    xmin, xmax = min(a for a, _ in counts), max(a for a, _ in counts)
    ymin, ymax = min(b for _, b in counts), max(b for _, b in counts)
    # MATERIALIZE every bbox cell (the thing the engine must never do)
    full = {(a, b): counts.get((a, b), 0)
            for a in range(xmin, xmax + 1) for b in range(ymin, ymax + 1)}
    n = len(full)
    xbar = sum(full.values()) / n
    num = 0.0
    w = 0
    for (a, b), x in full.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                q = full.get((a + dx, b + dy))
                if q is None:
                    continue
                w += 1
                num += (x - xbar) * (q - xbar)
    den = sum((x - xbar) ** 2 for x in full.values())
    return n, w, (n / w) * (num / den)


def test_morans_i_matches_brute_and_is_positive_for_clusters():
    from cartwright_ray.stages.hotspot import morans_i
    rng = np.random.default_rng(31)
    lat = np.r_[rng.normal(5.5, 1.2, 900), rng.normal(14.5, 1.0, 700)]
    lon = np.r_[rng.normal(5.5, 1.2, 900), rng.normal(14.5, 1.0, 700)]
    df = pd.DataFrame({"lat": lat, "lon": lon})
    n, w, want = _brute_morans(df)
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = morans_i(ds)
        assert int(got.loc[0, "n_cells"]) == n
        assert int(got.loc[0, "w_pairs"]) == w
        # brute accumulates floats in dict order; engine uses the exact
        # integer expansion — compare to rtol, exactness is the oracle's
        assert np.isclose(got.loc[0, "morans_i"], want, rtol=1e-9)
    assert want > 0.3                           # clusters autocorrelate


def test_uniform_grid_zero_variance():
    # every cell of a 4x4 bbox occupied with exactly 2 points: s2 == 0
    pts = [(y + 0.5 + k * 0.1, x + 0.5)
           for x in range(4) for y in range(4) for k in (0, 1)]
    df = pd.DataFrame(pts, columns=["lat", "lon"])
    out = getis_ord_cells(ray.data.from_pandas(df))
    assert len(out) == 16
    assert (out["x"] == 2).all()
    assert (out["gi_z"] == 0.0).all()


def test_mann_kendall_matches_brute():
    """Dense-bin Mann-Kendall S vs a per-cell double loop, including
    zero bins; monotone-up cell hits the +max bound, flat cell 0."""
    from cartwright_ray.stages.hotspot import mann_kendall_cells
    rng = np.random.default_rng(71)
    n = 1500
    base = pd.Timestamp("2024-01-01").value // 1000
    day = rng.integers(0, 10, n)
    # cell (5,5): rising counts by day; cell (2,2): uniform; rest random
    kind = rng.integers(0, 3, n)
    day[kind == 0] = np.minimum((rng.integers(0, 10, (kind == 0).sum())
                                 ** 2) // 10, 9)
    lon = np.where(kind == 0, 5.5, np.where(kind == 1, 2.5,
                   rng.uniform(0, 8, n)))
    lat = np.where(kind == 0, 5.5, np.where(kind == 1, 2.5,
                   rng.uniform(0, 8, n)))
    df = pd.DataFrame({
        "lat": lat, "lon": lon,
        "ts": pd.to_datetime(base + day * 86_400_000_000
                             + rng.integers(0, 86_400_000_000, n),
                             unit="us")})
    got = mann_kendall_cells(ray.data.from_pandas(df).repartition(5))

    us = df["ts"].astype("datetime64[us]").astype("int64")
    d = (us // 86_400_000_000).to_numpy()
    d0, d1 = d.min(), d.max()
    cx = np.floor(df["lon"]).astype(np.int64)
    cy = np.floor(df["lat"]).astype(np.int64)
    want_rows = []
    for (a, b) in sorted(set(zip(cx, cy))):
        sel = (cx == a) & (cy == b)
        dense = np.zeros(d1 - d0 + 1, np.int64)
        for dd in d[sel.to_numpy() if hasattr(sel, "to_numpy") else sel]:
            dense[dd - d0] += 1
        s = 0
        for i in range(len(dense)):
            for j in range(i + 1, len(dense)):
                s += int(np.sign(dense[j] - dense[i]))
        want_rows.append((a, b, int(dense.sum()), s))
    want = pd.DataFrame(want_rows,
                        columns=["cx", "cy", "n_events", "s_stat"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ripley_k_matches_brute():
    """Ghost-scatter pair counting vs the O(n²) double loop, and the
    CSR sanity: K(r) grows with r and clustered points exceed the
    uniform expectation at small r."""
    from cartwright_ray.stages.hotspot import ripley_k
    rng = np.random.default_rng(73)
    n = 400
    x = np.r_[rng.integers(0, 60, n // 2),
              rng.integers(20, 26, n // 2)].astype(np.int64)
    y = np.r_[rng.integers(0, 60, n // 2),
              rng.integers(20, 26, n // 2)].astype(np.int64)
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                       "x": x, "y": y})
    dx = x[:, None] - x
    dy = y[:, None] - y
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, 10**9)
    area = (x.max() - x.min()) * (y.max() - y.min())
    want = []
    for r in (2, 4, 8):
        p = int((d2 <= r * r).sum())
        want.append((r, p, float(area) * float(p)
                     / (float(n) * float(n))))
    want = pd.DataFrame(want, columns=["r", "n_pairs", "k_hat"])
    for blocks in (1, 6):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = ripley_k(ds)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert want["n_pairs"].is_monotonic_increasing
    # clustered half pushes K above the CSR expectation pi*r^2 at r=4
    assert want.loc[1, "k_hat"] > np.pi * 16


def test_cusum_change_point_detects_planted_shift():
    """CUSUM argmax lands on a planted level shift and the statistic
    is the exact integer |B·prefix − k·total| at that k."""
    import sys
    sys.path.insert(0, "/root/repo")
    import importlib
    m = importlib.import_module("__ray_entry__")
    import pandas as pd
    import tempfile, os
    # synth: type 'a' jumps from 2/day to 20/day at day 10 of 20
    rows = []
    base = pd.Timestamp("2024-01-01").value // 1000
    eid = 0
    for d in range(20):
        for _ in range(2 if d < 10 else 20):
            rows.append(("a", base + d * 86_400_000_000 + eid))
            eid += 1
        rows.append(("b", base + d * 86_400_000_000 + 500))
    df = pd.DataFrame(rows, columns=["event_type", "ts_us"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    df["event_id"] = range(len(df))
    df["user_id"] = 0
    df["value"] = 0.0
    df["props"] = ""
    with tempfile.TemporaryDirectory() as td:
        df[["event_id", "ts", "user_id", "event_type", "value",
            "props"]].to_parquet(os.path.join(td, "events.parquet"))
        out = m.queries()["cusum_change_points"](td)
    a = out.set_index("event_type").loc["a"]
    assert a["cp_bin"] == 10               # split right at the shift
    # exact integer statistic: B=20, prefix_10=20, total=220
    assert a["stat"] == abs(20 * 20 - 10 * 220)
    b = out.set_index("event_type").loc["b"]
    assert b["stat"] == 0                  # perfectly flat series


def test_gearys_c_matches_brute():
    from cartwright_ray.stages.hotspot import gearys_c, morans_i

    rng = np.random.default_rng(23)
    lat = np.r_[rng.uniform(10, 13, 1500), rng.uniform(20, 26, 1500)]
    lon = np.r_[rng.uniform(40, 43, 1500), rng.uniform(50, 56, 1500)]
    df = pd.DataFrame({"lat": lat, "lon": lon})

    cx = np.floor(lon).astype(int)
    cy = np.floor(lat).astype(int)
    xmin, xmax, ymin, ymax = cx.min(), cx.max(), cy.min(), cy.max()
    rws, cls = ymax - ymin + 1, xmax - xmin + 1
    dense = np.zeros((rws, cls), np.int64)
    np.add.at(dense, (cy - ymin, cx - xmin), 1)
    n = rws * cls
    xbar = dense.sum() / n
    num = 0.0
    w_tot = 0
    for i in range(rws):
        for j in range(cls):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if di == 0 and dj == 0:
                        continue
                    i2, j2 = i + di, j + dj
                    if 0 <= i2 < rws and 0 <= j2 < cls:
                        w_tot += 1
                        num += (dense[i, j] - dense[i2, j2]) ** 2
    den = ((dense - xbar) ** 2).sum()
    want = (n - 1) * num / (2 * w_tot * den)

    for blocks in (1, 7):
        got = gearys_c(ray.data.from_pandas(df).repartition(blocks))
        assert int(got["w_pairs"].iloc[0]) == w_tot
        assert abs(float(got["gearys_c"].iloc[0]) - want) < 1e-9

    # clustered data: C < 1 (positive autocorrelation), I > 0 — the
    # two statistics must agree on the sign of the association
    i_val = float(morans_i(ray.data.from_pandas(df))
                  ["morans_i"].iloc[0])
    assert float(got["gearys_c"].iloc[0]) < 1.0 and i_val > 0.0


def test_gearys_c_uniform_grid_is_one_free():
    """An exactly-uniform fully-occupied grid has den == 0 → the
    documented 0.0 sentinel (variance-free C is undefined)."""
    from cartwright_ray.stages.hotspot import gearys_c

    lat, lon = np.meshgrid(np.arange(4) + 0.5, np.arange(5) + 0.5)
    df = pd.DataFrame({"lat": lat.ravel(), "lon": lon.ravel()})
    got = gearys_c(ray.data.from_pandas(df))
    assert float(got["gearys_c"].iloc[0]) == 0.0


def test_local_morans_matches_brute_and_quadrants():
    from cartwright_ray.stages.hotspot import local_morans_cells

    rng = np.random.default_rng(31)
    lat = np.r_[rng.uniform(10, 13, 1200), rng.uniform(20, 26, 1200)]
    lon = np.r_[rng.uniform(40, 43, 1200), rng.uniform(50, 56, 1200)]
    df = pd.DataFrame({"lat": lat, "lon": lon})

    cx = np.floor(lon).astype(int)
    cy = np.floor(lat).astype(int)
    xmin, xmax, ymin, ymax = cx.min(), cx.max(), cy.min(), cy.max()
    rws, cls = ymax - ymin + 1, xmax - xmin + 1
    dense = np.zeros((rws, cls), np.int64)
    np.add.at(dense, (cy - ymin, cx - xmin), 1)
    n = rws * cls
    xbar = dense.sum() / n
    m2 = ((dense - xbar) ** 2).sum() / n

    runs = [local_morans_cells(ray.data.from_pandas(df)
                               .repartition(b)) for b in (1, 6)]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    got = runs[0]
    assert len(got) == int((dense > 0).sum())
    for _, r in got.iterrows():
        i, j = int(r.cy) - ymin, int(r.cx) - xmin
        lag = 0.0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                i2, j2 = i + di, j + dj
                if 0 <= i2 < rws and 0 <= j2 < cls:
                    lag += dense[i2, j2] - xbar
        want = (dense[i, j] - xbar) * lag / m2
        assert abs(float(r.local_i) - want) < 1e-9
        want_q = (("H" if dense[i, j] > xbar else "L")
                  + ("H" if lag > 0 else "L"))
        assert r.quad == want_q
    # both cluster cores must contain HH cells; the LISA map of a
    # two-cluster field is dominated by HH/LL agreement
    assert (got.quad == "HH").any()


def test_cell_diversity_simpson_matches_brute():
    from cartwright_ray.stages.hotspot import cell_diversity_simpson

    rng = np.random.default_rng(77)
    n = 3000
    df = pd.DataFrame({
        "lat": rng.uniform(0, 5, n),
        "lon": rng.uniform(0, 5, n),
        "event_type": rng.choice(list("abcd"), n)})

    cells = {}
    for la, lo, ty in zip(df.lat, df.lon, df.event_type):
        key = (int(np.floor(lo)), int(np.floor(la)))
        cells.setdefault(key, {}).setdefault(ty, 0)
        cells[key][ty] += 1
    rows = []
    for (cx, cy), counts in sorted(cells.items()):
        tot = sum(counts.values())
        nn = sum(v * v for v in counts.values())
        rows.append((cx, cy, tot, len(counts),
                     1.0 - nn / (tot * tot)))
    want = pd.DataFrame(rows, columns=["cx", "cy", "n_events",
                                       "n_cats", "simpson"])

    for blocks in (1, 6):
        got = cell_diversity_simpson(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # monoculture cell: diversity exactly 0
    mono = pd.DataFrame({"lat": [10.5] * 4, "lon": [10.5] * 4,
                         "event_type": ["x"] * 4})
    g2 = cell_diversity_simpson(ray.data.from_pandas(mono))
    assert float(g2["simpson"].iloc[0]) == 0.0


def test_quadrat_vmr_regimes():
    """VMR discriminates the three point-pattern regimes, and the
    moment arithmetic matches a dense-grid brute replay."""
    from cartwright_ray.stages.hotspot import quadrat_vmr

    rng = np.random.default_rng(101)

    def vmr_of(lat, lon):
        df = pd.DataFrame({"lat": lat, "lon": lon})
        outs = [quadrat_vmr(ray.data.from_pandas(df).repartition(b))
                for b in (1, 5)]
        pd.testing.assert_frame_equal(outs[0], outs[1])
        r = outs[0].iloc[0]
        cx = np.floor(lon).astype(int)
        cy = np.floor(lat).astype(int)
        R = cy.max() - cy.min() + 1
        C = cx.max() - cx.min() + 1
        dense = np.zeros((R, C))
        np.add.at(dense, (cy - cy.min(), cx - cx.min()), 1)
        n = R * C
        want = (dense ** 2).sum() - dense.sum() ** 2 / n
        want = (want / (n - 1)) / (dense.sum() / n)
        assert abs(r.vmr - want) < 1e-9
        assert r.n_quadrats == n and r.n_points == len(lat)
        return float(r.vmr)

    # clustered: everything in 2 cells of a 10x10 region
    lat_c = np.r_[rng.uniform(0, 1, 500), rng.uniform(9, 10, 500)]
    lon_c = np.r_[rng.uniform(0, 1, 500), rng.uniform(9, 10, 500)]
    # uniform random over the region
    lat_u = rng.uniform(0, 10, 1000)
    lon_u = rng.uniform(0, 10, 1000)
    # perfectly regular: exactly 10 per cell
    gx, gy = np.meshgrid(np.arange(10), np.arange(10))
    lat_r = np.repeat(gy.ravel() + 0.5, 10)
    lon_r = np.repeat(gx.ravel() + 0.5, 10)

    v_c = vmr_of(lat_c, lon_c)
    v_u = vmr_of(lat_u, lon_u)
    v_r = vmr_of(lat_r, lon_r)
    assert v_c > 5.0 and 0.5 < v_u < 2.0 and v_r == 0.0
