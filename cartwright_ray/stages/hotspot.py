"""Getis-Ord Gi* hotspot detection over integer grid cells — the
standard local spatial-autocorrelation statistic (Getis & Ord 1992,
"The Analysis of Spatial Association by Use of Distance Statistics"),
binary 3×3 queen-contiguity weights including self.

Study region: the integer-degree bounding box of occupied cells; empty
cells inside it contribute x=0 to the global moments and to neighbor
sums (implicitly — they are never materialized). Gi* is emitted for
OCCUPIED cells only (the practical convention; empty-cell scores are
derivable from the same moments).

Scale shape — ONE cell-keyed shuffle, no join:

- Per-block partial counts (combiner rule) → ``groupby(cx,cy).sum``
  gives the occupied-cell table, never collected.
- Each occupied cell then emits 9 rows — its count attributed to every
  3×3 neighbor position, tagged ``own`` on the center copy — and a
  second groupby reduces (wsum, own) per position in the same pass;
  ``own > 0`` filters back to occupied cells. This replaces the
  neighbor self-join with a map + groupby (shuffle volume 9×|cells|,
  independent of point volume).
- Global moments (Σx, Σx², bbox) are an O(1) driver reduce over the
  cell table; the closing z-map is stateless and broadcast.

Cross-engine exactness: counts are int64; n, W are derived integers;
z is ONE float expression over those integers, mirrored token-for-token
in the DuckDB oracle (sqrt is correctly rounded in both engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_NEIGHBOR_D = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cells_partial(t: pa.Table, lat_col: str, lon_col: str) -> pa.Table:
    cx = np.floor(np.asarray(t[lon_col], np.float64)).astype(np.int64)
    cy = np.floor(np.asarray(t[lat_col], np.float64)).astype(np.int64)
    df = pd.DataFrame({"cx": cx, "cy": cy, "x": 1})
    g = df.groupby(["cx", "cy"], sort=False).sum().reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def _scatter9(t: pa.Table) -> pa.Table:
    cx = np.asarray(t["cx"], np.int64)
    cy = np.asarray(t["cy"], np.int64)
    x = np.asarray(t["x"], np.int64)
    outs = []
    for dx, dy in _NEIGHBOR_D:
        outs.append(pa.table({
            "cx": pa.array(cx + dx), "cy": pa.array(cy + dy),
            "wsum": pa.array(x),
            "own": pa.array(x if (dx, dy) == (0, 0)
                            else np.zeros_like(x))}))
    return pa.concat_tables(outs)


def getis_ord_cells(ds, lat_col: str = "lat", lon_col: str = "lon"):
    """→ pandas (cx, cy, x, gi_z) for every occupied 1° cell, sorted by
    (cx, cy). ``ds`` needs point columns lat/lon."""
    import functools

    from ray.data.aggregate import Sum

    cells = (ds.map_batches(
                 functools.partial(_cells_partial, lat_col=lat_col,
                                   lon_col=lon_col),
                 batch_format="pyarrow")
             .groupby(["cx", "cy"])
             .aggregate(Sum("x", alias_name="x"))
             # PIN: consumed twice (global moments + scatter-9); the
             # table is O(cells) — without materialize() the corpus
             # read + groupby re-executes per consumer (measured 2x)
             .materialize())

    # O(1) global moments over the occupied-cell table (tiny rows/key)
    agg = cells.map_batches(
        lambda t: pa.table({
            "sx": [int(np.asarray(t["x"], np.int64).sum())],
            "sxx": [int((np.asarray(t["x"], np.int64) ** 2).sum())],
            "xmin": [int(np.asarray(t["cx"], np.int64).min())],
            "xmax": [int(np.asarray(t["cx"], np.int64).max())],
            "ymin": [int(np.asarray(t["cy"], np.int64).min())],
            "ymax": [int(np.asarray(t["cy"], np.int64).max())]}),
        batch_format="pyarrow").to_pandas()
    sx, sxx = int(agg["sx"].sum()), int(agg["sxx"].sum())
    xmin, xmax = int(agg["xmin"].min()), int(agg["xmax"].max())
    ymin, ymax = int(agg["ymin"].min()), int(agg["ymax"].max())
    n = (xmax - xmin + 1) * (ymax - ymin + 1)

    nb = (cells.map_batches(_scatter9, batch_format="pyarrow")
          .groupby(["cx", "cy"])
          .aggregate(Sum("wsum", alias_name="wsum"),
                     Sum("own", alias_name="own")))

    def z_map(t: pa.Table) -> pa.Table:
        own = np.asarray(t["own"], np.int64)
        keep = own > 0
        cx = np.asarray(t["cx"], np.int64)[keep]
        cy = np.asarray(t["cy"], np.int64)[keep]
        x = own[keep]
        wsum = np.asarray(t["wsum"], np.int64)[keep]
        # in-bbox 3x3 neighborhood size (integer, edge-aware)
        w = ((np.minimum(cx + 1, xmax) - np.maximum(cx - 1, xmin) + 1)
             * (np.minimum(cy + 1, ymax) - np.maximum(cy - 1, ymin) + 1)
             ).astype(np.float64)
        xbar = float(sx) / float(n)
        s2 = float(sxx) / float(n) - xbar * xbar
        # not (s2 > 0) also catches the float-negative-zero of an
        # exactly-uniform grid; mirrored verbatim in the SQL oracle
        if n < 2 or not (s2 > 0.0):
            z = np.zeros(len(cx))
        else:
            s = np.sqrt(s2)
            num = wsum.astype(np.float64) - xbar * w
            den = s * np.sqrt((float(n) * w - w * w) / float(n - 1))
            # n == W (bbox no larger than one neighborhood): no
            # variance in the weight pattern, the statistic is undefined
            z = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "x": pa.array(x),
                         "gi_z": pa.array(z, pa.float64())})

    out = nb.map_batches(z_map, batch_format="pyarrow").to_pandas()
    return out.sort_values(["cx", "cy"]).reset_index(drop=True)


def morans_i(ds, lat_col: str = "lat", lon_col: str = "lon"):
    """Global Moran's I (Moran 1950) over the 1° cell grid, binary
    queen weights (w_ii = 0), study region = the occupied-cell bbox
    with empty cells as x = 0 members.

    Empty cells are NEVER materialized: with z = x − x̄,
    Σᵢⱼ wᵢⱼ zᵢ zⱼ expands to Σ_occ x·nbrx − 2 x̄ Σ_occ x·deg + x̄² W,
    where nbrx (neighbor sum excluding self) and deg (in-bbox degree)
    are known at occupied cells, and W = Σ deg over ALL bbox cells has
    the closed form 2·[R(C−1) + C(R−1) + 2(R−1)(C−1)]. Every Σ is an
    exact int64 reduce off the same scatter-9 shuffle as
    :func:`getis_ord_cells`; the closing I is ONE float expression —
    bit-exact against the DuckDB self-join replay.

    → pandas single row (n_cells, w_pairs, morans_i).
    """
    import functools

    from ray.data.aggregate import Sum

    cells = (ds.map_batches(
                 functools.partial(_cells_partial, lat_col=lat_col,
                                   lon_col=lon_col),
                 batch_format="pyarrow")
             .groupby(["cx", "cy"])
             .aggregate(Sum("x", alias_name="x"))
             .materialize())          # PIN: two consumers (see above)

    agg = cells.map_batches(
        lambda t: pa.table({
            "sx": [int(np.asarray(t["x"], np.int64).sum())],
            "sxx": [int((np.asarray(t["x"], np.int64) ** 2).sum())],
            "xmin": [int(np.asarray(t["cx"], np.int64).min())],
            "xmax": [int(np.asarray(t["cx"], np.int64).max())],
            "ymin": [int(np.asarray(t["cy"], np.int64).min())],
            "ymax": [int(np.asarray(t["cy"], np.int64).max())]}),
        batch_format="pyarrow").to_pandas()
    sx, sxx = int(agg["sx"].sum()), int(agg["sxx"].sum())
    xmin, xmax = int(agg["xmin"].min()), int(agg["xmax"].max())
    ymin, ymax = int(agg["ymin"].min()), int(agg["ymax"].max())
    rows, cols = ymax - ymin + 1, xmax - xmin + 1
    n = rows * cols
    w_tot = 2 * (rows * (cols - 1) + cols * (rows - 1)
                 + 2 * (rows - 1) * (cols - 1))

    nb = (cells.map_batches(_scatter9, batch_format="pyarrow")
          .groupby(["cx", "cy"])
          .aggregate(Sum("wsum", alias_name="wsum"),
                     Sum("own", alias_name="own")))

    def cross_partial(t: pa.Table) -> pa.Table:
        own = np.asarray(t["own"], np.int64)
        keep = own > 0
        cx = np.asarray(t["cx"], np.int64)[keep]
        cy = np.asarray(t["cy"], np.int64)[keep]
        x = own[keep]
        nbrx = np.asarray(t["wsum"], np.int64)[keep] - x
        deg = ((np.minimum(cx + 1, xmax) - np.maximum(cx - 1, xmin) + 1)
               * (np.minimum(cy + 1, ymax) - np.maximum(cy - 1, ymin)
                  + 1) - 1)
        return pa.table({"xnbr": [int((x * nbrx).sum())],
                         "xdeg": [int((x * deg).sum())]})

    cp = nb.map_batches(cross_partial, batch_format="pyarrow").to_pandas()
    xnbr, xdeg = int(cp["xnbr"].sum()), int(cp["xdeg"].sum())

    import pandas as pd
    if n < 2 or w_tot == 0:
        return pd.DataFrame([(n, w_tot, 0.0)],
                            columns=["n_cells", "w_pairs", "morans_i"])
    xbar = float(sx) / float(n)
    num = float(xnbr) - 2.0 * xbar * float(xdeg) \
        + xbar * xbar * float(w_tot)
    den = float(sxx) - xbar * float(sx)
    i_val = (float(n) / float(w_tot)) * (num / den) if den > 0 else 0.0
    return pd.DataFrame([(n, w_tot, i_val)],
                        columns=["n_cells", "w_pairs", "morans_i"])


def mann_kendall_cells(ds, lat_col: str = "lat", lon_col: str = "lon",
                       ts_col: str = "ts",
                       bin_us: int = 86_400_000_000):
    """Emerging-hotspot trend: the Mann-Kendall S statistic (Mann 1945,
    Kendall 1975) of each 1° cell's time-binned event counts — the
    per-cell trend half of the classic space-time-cube "emerging hot
    spot" analysis. S = Σ_{i<j} sign(c_j − c_i) over the DENSE bin
    range (missing bins count 0 — a cell going quiet IS a trend).

    Scale shape: per-block (cell, bin) count partials → groupby sum
    (shuffle bounded by cells × bins per block); the global bin range
    is one O(1) driver reduce; then ONE hash exchange on the cell key
    and a whole-block kernel that scatters each cell's bins into a
    dense (cells × B) matrix and accumulates S with B vector passes —
    bins are bounded (B ≈ 30 days here), so the B² sign work is
    B · one-numpy-op, never per-row Python.

    All arithmetic is integer (counts, signs) — the DuckDB replay
    (dense generate_series bins + b < b' self-join + sum(sign)) is
    bit-exact. → pandas (cx, cy, n_events, s_stat) sorted."""
    import functools

    from ray.data.aggregate import Sum

    from .partition import hash_partitioned

    def cb_partial(t: pa.Table) -> pa.Table:
        cx = np.floor(np.asarray(t[lon_col], np.float64)).astype(np.int64)
        cy = np.floor(np.asarray(t[lat_col], np.float64)).astype(np.int64)
        ts = np.asarray(t[ts_col].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        b = ts // bin_us
        g = (pd.DataFrame({"cx": cx, "cy": cy, "b": b, "n": 1})
             .groupby(["cx", "cy", "b"], sort=False).sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    cb = (ds.map_batches(cb_partial, batch_format="pyarrow")
          .groupby(["cx", "cy", "b"])
          .aggregate(Sum("n", alias_name="n"))
          .materialize())             # PIN: range reduce + exchange

    rng = cb.map_batches(
        lambda t: pa.table({"d0": [int(np.asarray(t["b"]).min())],
                            "d1": [int(np.asarray(t["b"]).max())]}),
        batch_format="pyarrow").to_pandas()
    d0, d1 = int(rng["d0"].min()), int(rng["d1"].max())
    nbins = d1 - d0 + 1

    parted = hash_partitioned(cb, ["cx", "cy"])
    if parted is None:
        return pd.DataFrame(columns=["cx", "cy", "n_events", "s_stat"])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([pa.field("cx", pa.int64()),
                              pa.field("cy", pa.int64()),
                              pa.field("n_events", pa.int64()),
                              pa.field("s_stat", pa.int64())]
                             ).empty_table()
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        b = np.asarray(t["b"], np.int64) - d0
        n = np.asarray(t["n"], np.int64)
        order = np.lexsort((b, cy, cx))
        cx, cy, b, n = cx[order], cy[order], b[order], n[order]
        new = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])]
        cell_id = np.cumsum(new) - 1
        ncell = int(cell_id[-1]) + 1
        dense = np.zeros((ncell, nbins), np.int64)
        dense[cell_id, b] = n
        s = np.zeros(ncell, np.int64)
        for j in range(1, nbins):
            s += np.sign(dense[:, j, None] - dense[:, :j]).sum(axis=1)
        starts = np.flatnonzero(new)
        return pa.table({"cx": pa.array(cx[starts]),
                         "cy": pa.array(cy[starts]),
                         "n_events": pa.array(
                             np.add.reduceat(n, starts)),
                         "s_stat": pa.array(s)})

    out = (parted.map_batches(kernel, batch_format="pyarrow",
                              batch_size=None).to_pandas())
    return out.sort_values(["cx", "cy"]).reset_index(drop=True)


def ripley_k(points_ds, radii=(2, 4, 8), id_col: str = "event_id"):
    """Ripley's K function (Ripley 1976) at integer radii over ×8-int
    coordinates, no edge correction (the raw estimator; documented —
    matched exactly by the oracle): K̂(r) = A·P(r)/n², with P(r) the
    ORDERED pair count at distance² ≤ r² and A the integer bbox area.

    Pair counting is the home+ghost cell scatter: each point lands in
    its own cell as HOME and in the 8 neighbors as GHOST; with the cell
    edge (8) ≥ max radius, every ordered pair within range co-locates
    exactly once as (home, home∪ghost) — no dedup pass. One hash
    exchange on the cell key, per-cell mh×ma integer-decode pairing,
    int64 partial counts per radius, O(radii) driver reduce. The
    closing K is one shared float expression over exact integers.

    → pandas (r, n_pairs, k_hat) sorted by r."""
    import functools

    from .partition import hash_partitioned

    rmax = max(radii)
    assert rmax <= 8, "cell edge (8) must be >= max radius"
    r2s = sorted(int(r) * int(r) for r in radii)

    def scatter(t: pa.Table) -> pa.Table:
        x = np.asarray(t["x"], np.int64)
        y = np.asarray(t["y"], np.int64)
        eid = np.asarray(t[id_col], np.int64)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pa.table({
                    "cx": pa.array(x // 8 + dx),
                    "cy": pa.array(y // 8 + dy),
                    "ghost": pa.array(np.full(
                        len(x), 0 if (dx, dy) == (0, 0) else 1,
                        np.int64)),
                    "x": pa.array(x), "y": pa.array(y),
                    "eid": pa.array(eid)}))
        return pa.concat_tables(outs)

    # bbox + n: O(1) driver reduce off the raw points
    agg = points_ds.map_batches(
        lambda t: pa.table({
            "n": [t.num_rows],
            "xmin": [int(np.asarray(t["x"], np.int64).min())],
            "xmax": [int(np.asarray(t["x"], np.int64).max())],
            "ymin": [int(np.asarray(t["y"], np.int64).min())],
            "ymax": [int(np.asarray(t["y"], np.int64).max())]}),
        batch_format="pyarrow").to_pandas()
    n = int(agg["n"].sum())
    area = (int(agg["xmax"].max()) - int(agg["xmin"].min())) \
        * (int(agg["ymax"].max()) - int(agg["ymin"].min()))

    # quadratic per-cell pairing: size partitions by pair cost, not
    # row count (see crossing_join)
    parted = hash_partitioned(
        points_ds.map_batches(scatter, batch_format="pyarrow"),
        ["cx", "cy"], rows_per_partition=10_000)
    if parted is None or n < 2:
        return pd.DataFrame(columns=["r", "n_pairs", "k_hat"])

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"r2": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        gh = np.asarray(t["ghost"], np.int64)
        order = np.lexsort((gh, cy, cx))      # home rows first per cell
        cx, cy, gh = cx[order], cy[order], gh[order]
        x = np.asarray(t["x"], np.int64)[order]
        y = np.asarray(t["y"], np.int64)[order]
        eid = np.asarray(t["eid"], np.int64)[order]
        new = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(cx)]
        ma = ends - starts
        cell_of = np.cumsum(new) - 1
        mh = np.bincount(cell_of, weights=(gh == 0)).astype(np.int64)
        n2 = mh * ma
        rep = np.repeat(np.arange(len(ma)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        i = starts[rep] + tloc // ma[rep]     # home rows are the prefix
        j = starts[rep] + tloc % ma[rep]
        ok = eid[i] != eid[j]
        d2 = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
        cnts = [int(((d2 <= r2) & ok).sum()) for r2 in r2s]
        return pa.table({"r2": pa.array(r2s, pa.int64()),
                         "cnt": pa.array(cnts, pa.int64())})

    parts = parted.map_batches(pair_partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    rows = []
    for r in sorted(int(r) for r in radii):
        p = int(parts.loc[parts["r2"] == r * r, "cnt"].sum())
        k = float(area) * float(p) / (float(n) * float(n))
        rows.append((r, p, k))
    return pd.DataFrame(rows, columns=["r", "n_pairs", "k_hat"])


def semivariogram(points_ds, bin_w: int = 2, n_bins: int = 4,
                  value_col: str = "v", id_col: str = "event_id"):
    """Empirical (Matheron) semivariogram over ×8-integer coordinates
    and INTEGER point values, at distance bins ``[k·w, (k+1)·w)``:
    γ(k) = Σ(vᵢ−vⱼ)² / (2·N) over unordered point pairs in the bin.

    Integer values are the exactness contract (the winsorize/OLS
    stance): squared diffs and bin sums stay int64, so the engine and
    the SQL oracle agree bit-exactly; γ is ONE closing float division
    per bin. Float-valued columns work but lose the bit-exact oracle.

    Pair discipline is :func:`ripley_k`'s home+ghost scatter (cell
    edge 8 ≥ max distance ``n_bins·bin_w``): every ORDERED pair within
    range co-locates exactly once, the symmetric sums halve to the
    unordered estimator exactly (both are even integers). Bin index is
    an int64 ``searchsorted`` on the squared boundaries — no sqrt
    anywhere. Per-block partials are (bin, cnt, sumsq); the driver
    reduce is O(bins × blocks). Bins with no pairs are omitted
    (documented; the SQL GROUP BY mirrors this).

    → pandas (h_lo, h_hi, n_pairs, gamma) sorted by h_lo."""
    from .partition import hash_partitioned

    rmax = n_bins * bin_w
    assert rmax <= 8, "cell edge (8) must be >= max bin distance"
    bounds2 = np.array([(k * bin_w) ** 2 for k in range(n_bins + 1)],
                       np.int64)

    def scatter(t: pa.Table) -> pa.Table:
        x = np.asarray(t["x"], np.int64)
        y = np.asarray(t["y"], np.int64)
        eid = np.asarray(t[id_col], np.int64)
        v = np.asarray(t[value_col], np.int64)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pa.table({
                    "cx": pa.array(x // 8 + dx),
                    "cy": pa.array(y // 8 + dy),
                    "ghost": pa.array(np.full(
                        len(x), 0 if (dx, dy) == (0, 0) else 1,
                        np.int64)),
                    "x": pa.array(x), "y": pa.array(y),
                    "eid": pa.array(eid), "v": pa.array(v)}))
        return pa.concat_tables(outs)

    parted = hash_partitioned(
        points_ds.map_batches(scatter, batch_format="pyarrow"),
        ["cx", "cy"], rows_per_partition=10_000)
    if parted is None:
        return pd.DataFrame(columns=["h_lo", "h_hi", "n_pairs",
                                     "gamma"])

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bin": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64()),
                          "sumsq": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        gh = np.asarray(t["ghost"], np.int64)
        order = np.lexsort((gh, cy, cx))      # home rows first per cell
        cx, cy, gh = cx[order], cy[order], gh[order]
        x = np.asarray(t["x"], np.int64)[order]
        y = np.asarray(t["y"], np.int64)[order]
        eid = np.asarray(t["eid"], np.int64)[order]
        v = np.asarray(t["v"], np.int64)[order]
        new = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(cx)]
        ma = ends - starts
        cell_of = np.cumsum(new) - 1
        mh = np.bincount(cell_of, weights=(gh == 0)).astype(np.int64)
        n2 = mh * ma
        rep = np.repeat(np.arange(len(ma)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        i = starts[rep] + tloc // ma[rep]     # home rows are the prefix
        j = starts[rep] + tloc % ma[rep]
        d2 = (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
        ok = (eid[i] != eid[j]) & (d2 < bounds2[-1])
        b = np.searchsorted(bounds2, d2[ok], side="right") - 1
        cnt = np.bincount(b, minlength=n_bins).astype(np.int64)
        sq = (v[i][ok] - v[j][ok]) ** 2
        sums = np.zeros(n_bins, np.int64)
        np.add.at(sums, b, sq)
        return pa.table({"bin": pa.array(np.arange(n_bins, dtype=np.int64)),
                         "cnt": pa.array(cnt), "sumsq": pa.array(sums)})

    parts = parted.map_batches(pair_partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    rows = []
    for k in range(n_bins):
        sel = parts[parts["bin"] == k]
        n_o = int(sel["cnt"].sum())
        s_o = int(sel["sumsq"].sum())
        if n_o == 0:
            continue
        # ordered → unordered: both sums are exactly even
        n_u, s_u = n_o // 2, s_o // 2
        rows.append((k * bin_w, (k + 1) * bin_w, n_u,
                     float(s_u) / (2.0 * float(n_u))))
    return pd.DataFrame(rows, columns=["h_lo", "h_hi", "n_pairs",
                                       "gamma"])


def kde_cells(points_ds, h: int = 8):
    """Kernel-density heatmap over 1° grid cells: each cell center
    (8c+4, 8c'+4) accumulates the finite-support Epanechnikov-shape
    weight ``max(0, h² − d²)`` from every point within ``h`` — the
    standard KDE hotspot surface, UNNORMALIZED (the 2/(πh⁴) constant
    and any per-n scaling are presentation, not data; all arithmetic
    stays int64 so the oracle is bit-exact with no float anywhere).

    ``h`` ≤ 8 is required: a cell two steps away has its center ≥ 12
    units from any point of the home cell, so the 3×3 scatter is a
    complete cover. Scale shape is the Gi* scatter-9: each point emits
    ≤ 9 weighted rows (zero-weight rows dropped in-block), per-block
    partial sums per cell, ONE cell-keyed groupby sum — shuffle volume
    ≤ 9×|points| of narrow int64 rows, no pair enumeration at all.

    → Dataset (cx, cy, kde_w) for cells with kde_w > 0."""
    from ray.data.aggregate import Sum

    assert h <= 8, "3x3 scatter requires h <= cell edge (8)"
    h2 = np.int64(h * h)

    def scatter_w(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64()),
                             "kde_w": pa.array([], pa.int64())})
        x = np.asarray(t["x"], np.int64)
        y = np.asarray(t["y"], np.int64)
        cx0 = x // 8
        cy0 = y // 8
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx = cx0 + dx
                cy = cy0 + dy
                d2 = (x - (cx * 8 + 4)) ** 2 + (y - (cy * 8 + 4)) ** 2
                w = h2 - d2
                keep = w > 0
                if keep.any():
                    outs.append(pd.DataFrame({"cx": cx[keep],
                                              "cy": cy[keep],
                                              "kde_w": w[keep]}))
        if not outs:
            return pa.table({"cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64()),
                             "kde_w": pa.array([], pa.int64())})
        df = (pd.concat(outs).groupby(["cx", "cy"], sort=False)
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = points_ds.map_batches(scatter_w, batch_format="pyarrow")
    return (parts.groupby(["cx", "cy"])
            .aggregate(Sum("kde_w", alias_name="kde_w")))


def knox_statistic(points_ds, s: int = 4, tau_us: int = 3_600_000_000,
                   id_col: str = "event_id"):
    """Knox space-time interaction statistic (Knox 1964): the count of
    point pairs close in BOTH space (d² ≤ s²) and time (|Δt| ≤ τ),
    with the space-only and time-only marginal pair counts and the
    Mantel-style clustering ratio X·n(n−1) / (n_s·n_t) (> 1 ⇒ space
    and time proximity co-occur more than independence predicts;
    permutation inference is out of scope, documented).

    Pair counting is exact and shuffle-light:

    - SPACE and SPACE-TIME counts share ONE :func:`ripley_k`-style
      home+ghost cell exchange (s ≤ 8 = cell edge): per-cell ordered
      pairs evaluate both masks in the same kernel.
    - TIME count is the SAME discipline in 1D: each point lands in its
      τ-bucket as home and the two neighbor buckets as ghost —
      |Δt| ≤ τ implies bucket distance ≤ 1, so every ordered pair
      co-locates exactly once. A single calendar-hot bucket is the
      documented skew surface (the ripley hot-cell story, 1D).
    - All counts are int64 ordered-pair counts halved exactly; the
      ratio is ONE closing float expression over exact integers.

    → pandas single row (n_points, n_pairs_st, n_pairs_s, n_pairs_t,
    knox_ratio)."""
    from .partition import hash_partitioned

    assert s <= 8, "cell edge (8) must be >= s"
    s2 = np.int64(s * s)
    tau = np.int64(tau_us)

    def scatter_xy(t: pa.Table) -> pa.Table:
        x = np.asarray(t["x"], np.int64)
        y = np.asarray(t["y"], np.int64)
        eid = np.asarray(t[id_col], np.int64)
        ts = np.asarray(t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pa.table({
                    "cx": pa.array(x // 8 + dx),
                    "cy": pa.array(y // 8 + dy),
                    "ghost": pa.array(np.full(
                        len(x), 0 if (dx, dy) == (0, 0) else 1,
                        np.int64)),
                    "x": pa.array(x), "y": pa.array(y),
                    "eid": pa.array(eid), "tus": pa.array(ts)}))
        return pa.concat_tables(outs)

    def pair_xy(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"st": pa.array([], pa.int64()),
                             "sp": pa.array([], pa.int64())})
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        gh = np.asarray(t["ghost"], np.int64)
        order = np.lexsort((gh, cy, cx))
        cx, cy, gh = cx[order], cy[order], gh[order]
        x = np.asarray(t["x"], np.int64)[order]
        y = np.asarray(t["y"], np.int64)[order]
        eid = np.asarray(t["eid"], np.int64)[order]
        tus = np.asarray(t["tus"], np.int64)[order]
        new = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(cx)]
        ma = ends - starts
        cell_of = np.cumsum(new) - 1
        mh = np.bincount(cell_of, weights=(gh == 0)).astype(np.int64)
        n2 = mh * ma
        rep = np.repeat(np.arange(len(ma)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        i = starts[rep] + tloc // ma[rep]
        j = starts[rep] + tloc % ma[rep]
        ok = eid[i] != eid[j]
        near = ok & ((x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2 <= s2)
        both = near & (np.abs(tus[i] - tus[j]) <= tau)
        return pa.table({"st": pa.array([int(both.sum())]),
                         "sp": pa.array([int(near.sum())])})

    def scatter_t(t: pa.Table) -> pa.Table:
        eid = np.asarray(t[id_col], np.int64)
        ts = np.asarray(t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        outs = []
        for db in (-1, 0, 1):
            outs.append(pa.table({
                "tb": pa.array(ts // tau + db),
                "ghost": pa.array(np.full(
                    len(ts), 0 if db == 0 else 1, np.int64)),
                "eid": pa.array(eid), "tus": pa.array(ts)}))
        return pa.concat_tables(outs)

    def pair_t(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"tp": pa.array([], pa.int64())})
        tb = np.asarray(t["tb"], np.int64)
        gh = np.asarray(t["ghost"], np.int64)
        order = np.lexsort((gh, tb))
        tb, gh = tb[order], gh[order]
        eid = np.asarray(t["eid"], np.int64)[order]
        tus = np.asarray(t["tus"], np.int64)[order]
        new = np.r_[True, tb[1:] != tb[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(tb)]
        ma = ends - starts
        cell_of = np.cumsum(new) - 1
        mh = np.bincount(cell_of, weights=(gh == 0)).astype(np.int64)
        n2 = mh * ma
        rep = np.repeat(np.arange(len(ma)), n2)
        tloc = np.arange(int(n2.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(n2) - n2, n2)
        i = starts[rep] + tloc // ma[rep]
        j = starts[rep] + tloc % ma[rep]
        ok = (eid[i] != eid[j]) & (np.abs(tus[i] - tus[j]) <= tau)
        return pa.table({"tp": pa.array([int(ok.sum())])})

    n = points_ds.count()
    if n < 2:
        return pd.DataFrame(columns=["n_points", "n_pairs_st",
                                     "n_pairs_s", "n_pairs_t",
                                     "knox_ratio"])
    parted = hash_partitioned(
        points_ds.map_batches(scatter_xy, batch_format="pyarrow"),
        ["cx", "cy"], rows_per_partition=10_000)
    xy = parted.map_batches(pair_xy, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    tparted = hash_partitioned(
        points_ds.map_batches(scatter_t, batch_format="pyarrow"),
        ["tb"], rows_per_partition=10_000)
    tp = tparted.map_batches(pair_t, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    st_o, sp_o = int(xy["st"].sum()), int(xy["sp"].sum())
    tp_o = int(tp["tp"].sum())
    st_u, sp_u, tp_u = st_o // 2, sp_o // 2, tp_o // 2
    npairs = n * (n - 1) // 2
    ratio = (float(st_u) * float(npairs)
             / (float(sp_u) * float(tp_u))) \
        if sp_u and tp_u else float("nan")
    return pd.DataFrame([(n, st_u, sp_u, tp_u, ratio)],
                        columns=["n_points", "n_pairs_st", "n_pairs_s",
                                 "n_pairs_t", "knox_ratio"])


def gearys_c(ds, lat_col: str = "lat", lon_col: str = "lon"):
    """Global Geary's C (Geary 1954, "The Contiguity Ratio and
    Statistical Mapping") over the 1° cell grid, binary queen weights
    (w_ii = 0), study region = the occupied-cell bbox with empty cells
    as x = 0 members — the same conventions as :func:`morans_i`, whose
    local-difference counterpart this is (C weighs (xᵢ−xⱼ)² where I
    weighs cross-products).

    Empty cells are never materialized: with binary symmetric weights,
    Σᵢⱼ wᵢⱼ (xᵢ−xⱼ)² = 2·(Σᵢ xᵢ²·degᵢ − Σᵢ xᵢ·nbrxᵢ), and both sums
    vanish on empty cells (x = 0), so they reduce over OCCUPIED cells
    only; deg (in-bbox queen degree) is edge-aware closed-form and
    nbrx (neighbor sum excluding self) falls out of the same scatter-9
    exchange as :func:`getis_ord_cells`. The denominator's
    Σᵢ(xᵢ−x̄)² over ALL n bbox cells is sxx − sx²/n. Every Σ is exact
    int64; the closing C = (n−1)·num / (2W·den) is ONE float
    expression mirrored token-for-token in the DuckDB oracle.

    → pandas single row (n_cells, w_pairs, gearys_c)."""
    import functools

    from ray.data.aggregate import Sum

    cells = (ds.map_batches(
                 functools.partial(_cells_partial, lat_col=lat_col,
                                   lon_col=lon_col),
                 batch_format="pyarrow")
             .groupby(["cx", "cy"])
             .aggregate(Sum("x", alias_name="x"))
             .materialize())          # PIN: two consumers (see Gi*)

    agg = cells.map_batches(
        lambda t: pa.table({
            "sx": [int(np.asarray(t["x"], np.int64).sum())],
            "sxx": [int((np.asarray(t["x"], np.int64) ** 2).sum())],
            "xmin": [int(np.asarray(t["cx"], np.int64).min())],
            "xmax": [int(np.asarray(t["cx"], np.int64).max())],
            "ymin": [int(np.asarray(t["cy"], np.int64).min())],
            "ymax": [int(np.asarray(t["cy"], np.int64).max())]}),
        batch_format="pyarrow").to_pandas()
    sx, sxx = int(agg["sx"].sum()), int(agg["sxx"].sum())
    xmin, xmax = int(agg["xmin"].min()), int(agg["xmax"].max())
    ymin, ymax = int(agg["ymin"].min()), int(agg["ymax"].max())
    rows, cols = ymax - ymin + 1, xmax - xmin + 1
    n = rows * cols
    w_tot = 2 * (rows * (cols - 1) + cols * (rows - 1)
                 + 2 * (rows - 1) * (cols - 1))

    nb = (cells.map_batches(_scatter9, batch_format="pyarrow")
          .groupby(["cx", "cy"])
          .aggregate(Sum("wsum", alias_name="wsum"),
                     Sum("own", alias_name="own")))

    def diff_partial(t: pa.Table) -> pa.Table:
        own = np.asarray(t["own"], np.int64)
        keep = own > 0
        cx = np.asarray(t["cx"], np.int64)[keep]
        cy = np.asarray(t["cy"], np.int64)[keep]
        x = own[keep]
        nbrx = np.asarray(t["wsum"], np.int64)[keep] - x
        deg = ((np.minimum(cx + 1, xmax) - np.maximum(cx - 1, xmin) + 1)
               * (np.minimum(cy + 1, ymax) - np.maximum(cy - 1, ymin)
                  + 1) - 1)
        return pa.table({"xxdeg": [int((x * x * deg).sum())],
                         "xnbr": [int((x * nbrx).sum())]})

    dp = nb.map_batches(diff_partial, batch_format="pyarrow").to_pandas()
    num_int = 2 * (int(dp["xxdeg"].sum()) - int(dp["xnbr"].sum()))

    if n < 2 or w_tot == 0:
        return pd.DataFrame([(n, w_tot, 0.0)],
                            columns=["n_cells", "w_pairs", "gearys_c"])
    den = float(sxx) - float(sx) * float(sx) / float(n)
    c_val = (float(n - 1) * float(num_int)
             / (2.0 * float(w_tot) * den)) if den > 0 else 0.0
    return pd.DataFrame([(n, w_tot, c_val)],
                        columns=["n_cells", "w_pairs", "gearys_c"])


def local_morans_cells(ds, lat_col: str = "lat", lon_col: str = "lon"):
    """Local Moran's I — the LISA statistic (Anselin 1995, "Local
    Indicators of Spatial Association") per occupied 1° cell, binary
    queen weights (w_ii = 0), empty-bbox-cells-as-zero study region:

        Iᵢ = (xᵢ − x̄)·(nbrxᵢ − degᵢ·x̄) / m₂,   m₂ = Σ(x−x̄)²/n

    (Σⱼ wᵢⱼ(xⱼ − x̄) collapses to nbrx − deg·x̄ because empty neighbors
    contribute exactly −x̄ each.) Each cell also gets its Moran-scatter
    quadrant label: HH/LL cluster cores, HL/LH outliers, decided by the
    signs of (x − x̄) and the neighbor-mean deviation — the standard
    LISA cluster map. Same single scatter-9 exchange as
    :func:`getis_ord_cells`; moments are exact int64, the closing Iᵢ is
    one shared float expression and the quadrant CASE uses the same
    float comparisons in both engines.

    → pandas (cx, cy, x, local_i, quad) sorted by (cx, cy)."""
    import functools

    from ray.data.aggregate import Sum

    cells = (ds.map_batches(
                 functools.partial(_cells_partial, lat_col=lat_col,
                                   lon_col=lon_col),
                 batch_format="pyarrow")
             .groupby(["cx", "cy"])
             .aggregate(Sum("x", alias_name="x"))
             .materialize())          # PIN: two consumers (see Gi*)

    agg = cells.map_batches(
        lambda t: pa.table({
            "sx": [int(np.asarray(t["x"], np.int64).sum())],
            "sxx": [int((np.asarray(t["x"], np.int64) ** 2).sum())],
            "xmin": [int(np.asarray(t["cx"], np.int64).min())],
            "xmax": [int(np.asarray(t["cx"], np.int64).max())],
            "ymin": [int(np.asarray(t["cy"], np.int64).min())],
            "ymax": [int(np.asarray(t["cy"], np.int64).max())]}),
        batch_format="pyarrow").to_pandas()
    sx, sxx = int(agg["sx"].sum()), int(agg["sxx"].sum())
    xmin, xmax = int(agg["xmin"].min()), int(agg["xmax"].max())
    ymin, ymax = int(agg["ymin"].min()), int(agg["ymax"].max())
    n = (xmax - xmin + 1) * (ymax - ymin + 1)

    nb = (cells.map_batches(_scatter9, batch_format="pyarrow")
          .groupby(["cx", "cy"])
          .aggregate(Sum("wsum", alias_name="wsum"),
                     Sum("own", alias_name="own")))

    def lisa_map(t: pa.Table) -> pa.Table:
        own = np.asarray(t["own"], np.int64)
        keep = own > 0
        cx = np.asarray(t["cx"], np.int64)[keep]
        cy = np.asarray(t["cy"], np.int64)[keep]
        x = own[keep]
        nbrx = (np.asarray(t["wsum"], np.int64)[keep] - x) \
            .astype(np.float64)
        deg = ((np.minimum(cx + 1, xmax) - np.maximum(cx - 1, xmin) + 1)
               * (np.minimum(cy + 1, ymax) - np.maximum(cy - 1, ymin)
                  + 1) - 1).astype(np.float64)
        xbar = float(sx) / float(n)
        m2 = float(sxx) / float(n) - xbar * xbar
        z = x.astype(np.float64) - xbar
        lagdev = nbrx - deg * xbar
        if n < 2 or not (m2 > 0.0):
            li = np.zeros(len(cx))
        else:
            li = z * lagdev / m2
        quad = np.where(z > 0.0, np.where(lagdev > 0.0, "HH", "HL"),
                        np.where(lagdev > 0.0, "LH", "LL"))
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "x": pa.array(x),
                         "local_i": pa.array(li, pa.float64()),
                         "quad": pa.array(quad.astype(object),
                                          pa.string())})

    out = nb.map_batches(lisa_map, batch_format="pyarrow").to_pandas()
    return out.sort_values(["cx", "cy"]).reset_index(drop=True)


def surface_gradient(cells_ds, val_col: str = "kde_w"):
    """Focal gradient (slope/aspect) of a sparse integer raster
    surface — the classic 4-neighbor central-difference terrain
    operator applied to any (cx, cy, value) cell table (here the KDE
    hotspot surface of :func:`kde_cells`; absent neighbors contribute
    0, the sparse-raster convention):

        gx = w(x+1, y) − w(x−1, y),  gy = w(x, y+1) − w(x, y−1)

    plus the integer steepness ``steep2 = gx² + gy²`` and the aspect
    octant of (gx, gy) under the same ordered cascade as the movement
    rose (``FLAT`` when gx = gy = 0).

    Scale shape: each occupied cell scatters its value to its 4 axis
    neighbors signed by direction (plus a tagged own-row), ONE
    cell-keyed groupby sums (gx, gy, own), and the closing map is
    stateless — shuffle volume 5×|cells|, everything int64, the
    DuckDB replay (4-offset VALUES scatter + identical CASE) is
    bit-exact.

    → pandas (cx, cy, w, gx, gy, steep2, aspect) at occupied cells,
    sorted by (cx, cy)."""
    from ray.data.aggregate import Sum

    from ..stages.tracks import _ROSE_SECTORS, _rose_sector

    def scatter4(t: pa.Table) -> pa.Table:
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        w = np.asarray(t[val_col], np.int64)
        z = np.zeros_like(w)
        outs = [pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                          "gx": pa.array(z), "gy": pa.array(z),
                          "own": pa.array(w)})]
        # a cell landing at (cx+dx, cy+dy) is that position's
        # OPPOSITE-side neighbor: scattering east (+1) makes it the
        # west neighbor there, so it contributes −w to gx, and vice
        # versa
        for dx, dy, sgn, axis in ((1, 0, -1, "gx"), (-1, 0, 1, "gx"),
                                  (0, 1, -1, "gy"), (0, -1, 1, "gy")):
            outs.append(pa.table({
                "cx": pa.array(cx + dx), "cy": pa.array(cy + dy),
                "gx": pa.array(sgn * w if axis == "gx" else z),
                "gy": pa.array(sgn * w if axis == "gy" else z),
                "own": pa.array(z)}))
        return pa.concat_tables(outs)

    nb = (cells_ds.map_batches(scatter4, batch_format="pyarrow")
          .groupby(["cx", "cy"])
          .aggregate(Sum("gx", alias_name="gx"),
                     Sum("gy", alias_name="gy"),
                     Sum("own", alias_name="own")))

    def close(t: pa.Table) -> pa.Table:
        own = np.asarray(t["own"], np.int64)
        keep = own > 0
        cx = np.asarray(t["cx"], np.int64)[keep]
        cy = np.asarray(t["cy"], np.int64)[keep]
        gx = np.asarray(t["gx"], np.int64)[keep]
        gy = np.asarray(t["gy"], np.int64)[keep]
        sec = _rose_sector(gx, gy)
        aspect = np.where(
            sec >= 0,
            np.array(_ROSE_SECTORS, object)[np.maximum(sec, 0)],
            "FLAT")
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "w": pa.array(own[keep]),
                         "gx": pa.array(gx), "gy": pa.array(gy),
                         "steep2": pa.array(gx * gx + gy * gy),
                         "aspect": pa.array(aspect.astype(object),
                                            pa.string())})

    out = nb.map_batches(close, batch_format="pyarrow").to_pandas()
    return out.sort_values(["cx", "cy"]).reset_index(drop=True)


def distance_transform_cells(ds, radius: int = 3,
                             lat_col: str = "lat",
                             lon_col: str = "lon"):
    """Bounded distance transform of the occupied-cell grid — for every
    cell within Chebyshev ``radius`` of an occupied 1° cell, the MIN
    squared cell distance to the nearest occupied cell (0 at occupied
    cells themselves). The raster proximity operator (buffer /
    cost-surface seed); beyond the radius the transform is truncated —
    the standard banded form at scale, since an unbounded transform
    needs iterative sweeps.

    Scale shape: per-block occupied-cell partials (combiner) → one
    cell groupby → each occupied cell scatters (2r+1)² rows carrying
    dx²+dy² → ONE cell-keyed groupby with a MIN aggregate. Shuffle
    volume (2r+1)²·|occupied|, all int64 — the DuckDB replay
    (generate_series offsets + min) is bit-exact.

    → pandas (cx, cy, d2min) sorted."""
    import functools

    from ray.data.aggregate import Min, Sum

    r = int(radius)
    cells = (ds.map_batches(
                 functools.partial(_cells_partial, lat_col=lat_col,
                                   lon_col=lon_col),
                 batch_format="pyarrow")
             .groupby(["cx", "cy"])
             .aggregate(Sum("x", alias_name="x")))

    offs = [(dx, dy) for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)]

    def scatter(t: pa.Table) -> pa.Table:
        cx = np.asarray(t["cx"], np.int64)
        cy = np.asarray(t["cy"], np.int64)
        outs = []
        for dx, dy in offs:
            outs.append(pa.table({
                "cx": pa.array(cx + dx), "cy": pa.array(cy + dy),
                "d2": pa.array(np.full(len(cx),
                                       dx * dx + dy * dy, np.int64))}))
        return pa.concat_tables(outs)

    out = (cells.map_batches(scatter, batch_format="pyarrow")
           .groupby(["cx", "cy"])
           .aggregate(Min("d2", alias_name="d2min"))
           .to_pandas())
    return out.sort_values(["cx", "cy"]).reset_index(drop=True)


def cell_diversity_simpson(ds, cat_col: str = "event_type",
                           lat_col: str = "lat",
                           lon_col: str = "lon"):
    """Per-cell Simpson diversity of a categorical column — the
    spatial diversity map (1 − Σp²; 0 = monoculture, →1 = evenly
    mixed). Chosen over Shannon entropy deliberately: Σn_c² is an
    exact int64, so the index closes as ONE float expression per cell
    (1 − Σn²/N²), where entropy's Σp·ln p would sum floats in
    engine-dependent order.

    Scale shape: per-block (cell, cat) count partials → one
    (cell, cat) groupby → squares computed stateless → a SECOND narrow
    groupby on the cell key alone (a (cell, cat) hash partition does
    not co-locate a cell's categories); both exchanges carry
    O(cells × cats) integer rows, independent of point volume.

    → pandas (cx, cy, n_events, n_cats, simpson) sorted."""
    import functools

    from ray.data.aggregate import Sum

    def cc_partial(t: pa.Table) -> pa.Table:
        cx = np.floor(np.asarray(t[lon_col], np.float64)) \
            .astype(np.int64)
        cy = np.floor(np.asarray(t[lat_col], np.float64)) \
            .astype(np.int64)
        cat = t[cat_col].to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"cx": cx, "cy": cy, "cat": cat, "n": 1})
             .groupby(["cx", "cy", "cat"], sort=False).sum()
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    cc = (ds.map_batches(cc_partial, batch_format="pyarrow")
          .groupby(["cx", "cy", "cat"])
          .aggregate(Sum("n", alias_name="n")))

    def sq(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"], np.int64)
        return pa.table({"cx": t["cx"].combine_chunks(),
                         "cy": t["cy"].combine_chunks(),
                         "n": pa.array(n), "nn": pa.array(n * n),
                         "k": pa.array(np.ones(len(n), np.int64))})

    agg = (cc.map_batches(sq, batch_format="pyarrow")
           .groupby(["cx", "cy"])
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("nn", alias_name="nn"),
                      Sum("k", alias_name="n_cats")))

    def close(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_events"], np.int64).astype(np.float64)
        nn = np.asarray(t["nn"], np.int64).astype(np.float64)
        return pa.table({"cx": t["cx"].combine_chunks(),
                         "cy": t["cy"].combine_chunks(),
                         "n_events": t["n_events"].combine_chunks(),
                         "n_cats": t["n_cats"].combine_chunks(),
                         "simpson": pa.array(1.0 - nn / (n * n),
                                             pa.float64())})

    out = agg.map_batches(close, batch_format="pyarrow").to_pandas()
    return out.sort_values(["cx", "cy"]).reset_index(drop=True)


def quadrat_vmr(ds, lat_col: str = "lat", lon_col: str = "lon"):
    """Quadrat-count complete-spatial-randomness test: the
    variance-mean ratio of per-cell counts over the DENSE occupied
    bbox (empty cells are 0-count quadrats — the classic Greig-Smith
    convention; VMR ≈ 1 under CSR, > 1 clustered, < 1 regular).

    All moments are the exact int64 (Σx, Σx², bbox) reduce shared with
    :func:`morans_i`; VMR = (Σx² − (Σx)²/n)/(n−1) / (Σx/n) is one
    float expression. → pandas single row (n_quadrats, n_points, vmr).
    """
    import functools

    from ray.data.aggregate import Sum

    cells = (ds.map_batches(
                 functools.partial(_cells_partial, lat_col=lat_col,
                                   lon_col=lon_col),
                 batch_format="pyarrow")
             .groupby(["cx", "cy"])
             .aggregate(Sum("x", alias_name="x")))

    agg = cells.map_batches(
        lambda t: pa.table({
            "sx": [int(np.asarray(t["x"], np.int64).sum())],
            "sxx": [int((np.asarray(t["x"], np.int64) ** 2).sum())],
            "xmin": [int(np.asarray(t["cx"], np.int64).min())],
            "xmax": [int(np.asarray(t["cx"], np.int64).max())],
            "ymin": [int(np.asarray(t["cy"], np.int64).min())],
            "ymax": [int(np.asarray(t["cy"], np.int64).max())]}),
        batch_format="pyarrow").to_pandas()
    sx, sxx = int(agg["sx"].sum()), int(agg["sxx"].sum())
    n = (int(agg["xmax"].max()) - int(agg["xmin"].min()) + 1) \
        * (int(agg["ymax"].max()) - int(agg["ymin"].min()) + 1)
    if n < 2 or sx == 0:
        return pd.DataFrame([(n, sx, 0.0)],
                            columns=["n_quadrats", "n_points", "vmr"])
    var = (float(sxx) - float(sx) * float(sx) / float(n)) \
        / float(n - 1)
    vmr = var / (float(sx) / float(n))
    return pd.DataFrame([(n, sx, vmr)],
                        columns=["n_quadrats", "n_points", "vmr"])
