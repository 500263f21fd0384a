"""Trajectory simplification — Douglas–Peucker (1973) polyline
reduction per track: keep a point iff dropping it would move the
polyline by more than ``eps`` (perpendicular distance to the chord of
its segment), recursing on the kept splits.

All geometry is compared in SQUARED form without division —
``cross² > eps² · |chord|²`` (point-to-point ``|p-a|² > eps²`` for the
zero-length chord) — a pure rational expression whose every operation
is IEEE exactly-rounded, so the keep-set is bit-identical in any
engine: the DuckDB oracle replays the recursion as a recursive CTE
(segments table seeded with track endpoints; each step splits at the
argmax-metric interior point, ties to the smallest sequence index).
Coordinates are treated as planar degrees (same documented convention
as :mod:`..joins.idw`).

Distribution: ONE sort exchange keyed on the track id alone (the
exchange-discipline rule — a composite key could split a track at a
range boundary), then a whole-block kernel. Within the block the
within-track order, track boundaries and output gather are single
numpy passes; the DP recursion itself runs per TRACK (a loop over
tracks, not rows — Douglas–Peucker is inherently per-polyline
recursive, O(n log n) typical, with all inner work vectorized over the
track's points).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .partition import key_segments


def douglas_peucker_keep(x: np.ndarray, y: np.ndarray,
                         eps: float) -> np.ndarray:
    """Boolean keep-mask for one polyline (points in path order).
    Endpoints are always kept; interior point ``m`` (first argmax)
    splits its segment iff metric(m) > eps² · denom."""
    n = len(x)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay = x[i], y[i]
        dx, dy = x[j] - ax, y[j] - ay
        len2 = dx * dx + dy * dy
        px = x[i + 1:j] - ax
        py = y[i + 1:j] - ay
        if len2 == 0.0:
            metric = px * px + py * py
            thresh = eps2
        else:
            cross = dx * py - dy * px
            metric = cross * cross
            thresh = eps2 * len2
        m = int(np.argmax(metric))           # first max = smallest seq
        if metric[m] > thresh:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_tracks(ds, eps: float, track_col: str = "user_id",
                    order_cols=("ts", "event_id"),
                    lat_col: str = "lat", lon_col: str = "lon",
                    keep_cols=("event_id",)):
    """→ (track_col, seq, *keep_cols, lat_col, lon_col) — the kept
    points of every track, ``seq`` being the 0-based within-track rank
    by ``order_cols``."""
    order_cols = list(order_cols)
    keep_cols = list(keep_cols)

    def kernel(t: pa.Table) -> pa.Table:
        u = np.asarray(t[track_col], np.int64)
        okeys = [np.asarray(t[c]) for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (u,))
        u = u[order]
        lat = np.asarray(t[lat_col], np.float64)[order]
        lon = np.asarray(t[lon_col], np.float64)[order]
        starts, seg = key_segments(u)
        idx = np.arange(len(u))
        seq = idx - starts[seg]
        keep = np.zeros(len(u), bool)
        for s, e in zip(starts, np.r_[starts[1:], len(u)]):
            keep[s:e] = douglas_peucker_keep(lat[s:e], lon[s:e], eps)
        sel = np.flatnonzero(keep)
        out = {track_col: pa.array(u[sel]),
               "seq": pa.array(seq[sel], pa.int64())}
        for c in keep_cols:
            out[c] = t[c].take(pa.array(order[sel], pa.int64()))
        out[lat_col] = pa.array(lat[sel], pa.float64())
        out[lon_col] = pa.array(lon[sel], pa.float64())
        return pa.table(out)

    return (ds.sort(track_col)
              .map_batches(kernel, batch_format="pyarrow",
                           batch_size=None))


# ---------------------------------------------------------------------------
# per-track extent: exact integer bounding box + exact farthest-pair
# diameter via a hull-of-hulls candidate reduction.
# ---------------------------------------------------------------------------

def _chain_candidates(k: np.ndarray, x: np.ndarray,
                      y: np.ndarray) -> np.ndarray:
    """Boolean mask of convex-hull CANDIDATE points for (k, x, y) rows
    sorted by (k, x, y): union of upper- and lower-chain survivors of an
    iterated, fully vectorized middle-point elimination.

    The elimination test is point-wise SOUND independent of what else is
    removed in the same pass: if neighbours a (left) and c (right) exist
    with b on-or-below chord a→c, then b is not an upper-hull vertex of
    the INPUT (the chord's endpoints are input points), so removing all
    flagged points simultaneously never loses a vertex; iterating to a
    fixed point leaves a superset of the hull vertices (collinear edge
    midpoints may be dropped — harmless for bbox/diameter, both attained
    at surviving extreme points). Each pass is one numpy sweep across
    EVERY track in the block; zigzag interiors halve per pass."""
    n = len(k)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    last_of_kx = np.r_[(k[1:] != k[:-1]) | (x[1:] != x[:-1]), True]
    first_of_kx = np.r_[True, (k[1:] != k[:-1]) | (x[1:] != x[:-1])]
    for seed, keep_left in ((last_of_kx, False), (first_of_kx, True)):
        alive = seed.copy()
        while True:
            idx = np.flatnonzero(alive)
            if len(idx) < 3:
                break
            a, b, c = idx[:-2], idx[1:-1], idx[2:]
            tri = (k[a] == k[b]) & (k[b] == k[c])
            cr = ((x[b] - x[a]) * (y[c] - y[a])
                  - (y[b] - y[a]) * (x[c] - x[a]))
            # upper chain keeps right turns (cr < 0); lower keeps left
            drop = tri & (cr <= 0 if keep_left else cr >= 0)
            if not drop.any():
                break
            alive[b[drop]] = False
        out |= alive
    return out


def track_extent(ds, track_col: str = "user_id", lat_col: str = "lat",
                 lon_col: str = "lon", scale: int = 8):
    """Exact per-track planar extent → one row per track:
    (track, xmin, xmax, ymin, ymax, diam2), where x = lon·scale,
    y = lat·scale as exact int64 (coordinates must be multiples of
    1/scale and |coord·scale| < 2^30 — squared distances then stay
    integer-exact, so the result is bit-identical in any engine) and
    diam2 = max pairwise squared distance (the diameter, squared).

    Scale shape: the farthest pair of a point set is attained between
    convex-hull vertices, and a point inside its own block's hull is
    inside the global hull — so each block reduces to its per-track
    hull-candidate points (:func:`_chain_candidates`, vectorized across
    all tracks at once), ONE narrow sort exchange on the track id
    co-locates the candidates, and the finalize kernel prunes once more
    then takes the O(h²) pairwise max per track (a loop over TRACKS,
    h = surviving hull points, with all inner work vectorized). The
    bbox falls out of ``np.minimum/maximum.reduceat`` on the same
    segments — candidates always retain the four extreme points.
    """
    from .partition import key_segments

    def to_int(t: pa.Table):
        u = np.asarray(t[track_col], np.int64)
        x = np.rint(np.asarray(t[lon_col], np.float64) * scale) \
            .astype(np.int64)
        y = np.rint(np.asarray(t[lat_col], np.float64) * scale) \
            .astype(np.int64)
        order = np.lexsort((y, x, u))
        return u[order], x[order], y[order]

    part_schema = pa.schema([pa.field(track_col, pa.int64()),
                             pa.field("x", pa.int64()),
                             pa.field("y", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        u, x, y = to_int(t)
        keep = _chain_candidates(u, x, y)
        return pa.table({track_col: pa.array(u[keep]),
                         "x": pa.array(x[keep]), "y": pa.array(y[keep])})

    out_schema = pa.schema([pa.field(track_col, pa.int64())] + [
        pa.field(c, pa.int64())
        for c in ("xmin", "xmax", "ymin", "ymax", "diam2")])

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = np.asarray(t[track_col], np.int64)
        x = np.asarray(t["x"], np.int64)
        y = np.asarray(t["y"], np.int64)
        order = np.lexsort((y, x, u))
        u, x, y = u[order], x[order], y[order]
        keep = _chain_candidates(u, x, y)
        u, x, y = u[keep], x[keep], y[keep]
        starts, seg = key_segments(u)
        ends = np.r_[starts[1:], len(u)]
        diam2 = np.empty(len(starts), np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            dx = x[s:e, None] - x[s:e]
            dy = y[s:e, None] - y[s:e]
            diam2[i] = (dx * dx + dy * dy).max()
        return pa.table({
            track_col: pa.array(u[starts]),
            "xmin": pa.array(np.minimum.reduceat(x, starts)),
            "xmax": pa.array(np.maximum.reduceat(x, starts)),
            "ymin": pa.array(np.minimum.reduceat(y, starts)),
            "ymax": pa.array(np.maximum.reduceat(y, starts)),
            "diam2": pa.array(diam2)})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
              .sort(track_col)
              .map_batches(finalize, batch_format="pyarrow",
                           batch_size=None))


def dwell_episodes(ds, min_pings: int = 3, track_col: str = "user_id",
                   order_cols=("ts", "event_id"),
                   event_col: str = "event_id",
                   lat_col: str = "lat", lon_col: str = "lon"):
    """Stay-point (dwell) episodes: maximal runs of ≥ ``min_pings``
    consecutive pings of one track inside the same 1° grid cell,
    in ``order_cols`` order — the grid-quantized variant of the Li et
    al. 2008 stay-point scan, chosen because runs-in-a-cell vectorizes
    to one lexsort + boundary cumsum per block (the anchor-advance
    original is a data-dependent per-row loop).

    → (track, cx, cy, start_event, end_event, n_pings, duration_us).

    Distribution: the cell bin is a stateless map; episodes need
    within-track order, so ONE sort exchange on the track id ALONE
    (exchange-discipline rule, see module docstring) then a whole-block
    kernel: run boundaries are a vectorized neighbor compare, per-run
    first/last/count are index arithmetic on the boundary positions —
    no reduceat even needed. SQL replays it as gaps-and-islands
    (rn − rn_per_cell run key + arg_min/arg_max by rn)."""

    def kernel(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            pa.field(track_col, pa.int64()), pa.field("cx", pa.int64()),
            pa.field("cy", pa.int64()),
            pa.field("start_event", pa.int64()),
            pa.field("end_event", pa.int64()),
            pa.field("n_pings", pa.int64()),
            pa.field("duration_us", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = np.asarray(t[track_col], np.int64)
        okeys = [np.asarray(t[c]) for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (u,))
        u = u[order]
        e = np.asarray(t[event_col], np.int64)[order]
        ts = np.asarray(t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)[order]
        cx = np.floor(np.asarray(t[lon_col], np.float64)[order]
                      ).astype(np.int64)
        cy = np.floor(np.asarray(t[lat_col], np.float64)[order]
                      ).astype(np.int64)
        new = np.r_[True, (u[1:] != u[:-1]) | (cx[1:] != cx[:-1])
                    | (cy[1:] != cy[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u)] - 1
        n = ends - starts + 1
        keep = n >= min_pings
        s, x = starts[keep], ends[keep]
        return pa.table({track_col: pa.array(u[s]),
                         "cx": pa.array(cx[s]), "cy": pa.array(cy[s]),
                         "start_event": pa.array(e[s]),
                         "end_event": pa.array(e[x]),
                         "n_pings": pa.array(n[keep]),
                         "duration_us": pa.array(ts[x] - ts[s])})

    return (ds.sort(track_col)
              .map_batches(kernel, batch_format="pyarrow",
                           batch_size=None))


def resample_tracks(ds, step_us: int = 3_600_000_000,
                    track_col: str = "user_id",
                    order_cols=("ts", "event_id")):
    """Time-regular track resampling: linear interpolation of each
    track's position at every ``step_us`` grid instant q with
    ``ts_first ≤ q < ts_last`` — the canonical trajectory-alignment
    preprocessing (comparable tracks need comparable clocks).

    Bracketing is the step-partition rule: consecutive pings (in
    (ts, event_id) order) partition the track's span into [t_i, t_i+1)
    intervals; q interpolates inside its interval with ONE shared float
    expression ``v1 + (v2−v1)·((q−t1)/(t2−t1))`` (exact-int diffs cast
    to double), so the DuckDB replay (lead window + interval join +
    the same expression) is bit-exact. Duplicate-ts pings yield empty
    intervals and are skipped identically in both engines.

    Scale shape: ONE track-keyed sort exchange; within the block the
    per-track work is a grid-count computation (vectorized) plus one
    ``searchsorted`` per TRACK (the track-not-row loop precedent of
    ``track_extent``), each vectorized over that track's grid points.

    → Dataset (track, h, lat, lon) where h = q / step_us."""

    def kernel(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([pa.field(track_col, pa.int64()),
                                pa.field("h", pa.int64()),
                                pa.field("lat", pa.float64()),
                                pa.field("lon", pa.float64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = np.asarray(t[track_col], np.int64)
        okeys = [np.asarray(t[c]) for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (u,))
        u = u[order]
        ts = np.asarray(t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)[order]
        lat = np.asarray(t["lat"], np.float64)[order]
        lon = np.asarray(t["lon"], np.float64)[order]
        starts, _ = key_segments(u)
        ends = np.r_[starts[1:], len(u)]
        out_u, out_h, out_lat, out_lon = [], [], [], []
        for s, e in zip(starts, ends):
            t0, t1 = ts[s], ts[e - 1]
            h0 = (t0 + step_us - 1) // step_us
            h1 = (t1 - 1) // step_us
            if h1 < h0:
                continue
            q = np.arange(h0, h1 + 1, dtype=np.int64) * step_us
            i = np.searchsorted(ts[s:e], q, side="right") - 1 + s
            f = (q - ts[i]).astype(np.float64) \
                / (ts[i + 1] - ts[i]).astype(np.float64)
            out_u.append(np.full(len(q), u[s], np.int64))
            out_h.append(q // step_us)
            out_lat.append(lat[i] + (lat[i + 1] - lat[i]) * f)
            out_lon.append(lon[i] + (lon[i + 1] - lon[i]) * f)
        if not out_u:
            return out_schema.empty_table()
        return pa.table({track_col: pa.array(np.concatenate(out_u)),
                         "h": pa.array(np.concatenate(out_h)),
                         "lat": pa.array(np.concatenate(out_lat)),
                         "lon": pa.array(np.concatenate(out_lon))})

    return (ds.sort(track_col)
            .map_batches(kernel, batch_format="pyarrow",
                         batch_size=None))


def track_sinuosity(ds, track_col: str = "user_id",
                    order_cols=("ts", "event_id"),
                    lat_col: str = "lat", lon_col: str = "lon",
                    scale: int = 8):
    """Per-track L1 (taxicab) sinuosity: route-length over net
    displacement, the classic directness index of movement analysis,
    computed in the L1 metric so every quantity is an exact int64
    (coordinates must be multiples of 1/scale, as in
    :func:`track_extent`) — the Euclidean variant would be a float SUM
    whose addition order differs across engines; L1 keeps the engine
    bit-identical to any SQL replay, with the ratio as the single
    closing float division.

    → one row per track: (track, n_pings, l1_path, l1_net, sinuosity),
    where l1_path = Σ|Δx|+|Δy| over the (order_cols)-ordered ping
    sequence, l1_net is first→last displacement, and sinuosity =
    l1_path / l1_net (0.0 for loops and single-ping tracks, net = 0).

    Scale shape: ONE sort exchange keyed on the track id ALONE (the
    exchange-discipline rule — a composite key can split a track at a
    range boundary), then a whole-block kernel: within-track order,
    boundary-masked |Δ| contributions and ``np.add.reduceat`` are each
    one numpy pass across ALL tracks in the block."""
    from .partition import key_segments

    o1, o2 = order_cols

    out_schema = pa.schema([
        pa.field(track_col, pa.int64()),
        pa.field("n_pings", pa.int64()),
        pa.field("l1_path", pa.int64()),
        pa.field("l1_net", pa.int64()),
        pa.field("sinuosity", pa.float64())])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = np.asarray(t[track_col], np.int64)
        k1 = np.asarray(t[o1].cast(pa.timestamp("us")).cast(pa.int64())
                        if pa.types.is_timestamp(t.schema.field(o1).type)
                        else t[o1], np.int64)
        k2 = np.asarray(t[o2], np.int64)
        x = np.rint(np.asarray(t[lon_col], np.float64) * scale) \
            .astype(np.int64)
        y = np.rint(np.asarray(t[lat_col], np.float64) * scale) \
            .astype(np.int64)
        order = np.lexsort((k2, k1, u))
        u, x, y = u[order], x[order], y[order]
        starts, _ = key_segments(u)
        ends = np.r_[starts[1:], len(u)]
        # per-row step contribution (i → i+1), zeroed across tracks
        c = np.zeros(len(u), np.int64)
        same = u[1:] == u[:-1]
        c[:-1] = np.where(same, np.abs(np.diff(x)) + np.abs(np.diff(y)),
                          0)
        path = np.add.reduceat(c, starts)
        net = (np.abs(x[ends - 1] - x[starts])
               + np.abs(y[ends - 1] - y[starts]))
        sin = np.where(net > 0, path / np.where(net > 0, net, 1), 0.0)
        return pa.table({track_col: pa.array(u[starts]),
                         "n_pings": pa.array(ends - starts),
                         "l1_path": pa.array(path),
                         "l1_net": pa.array(net),
                         "sinuosity": pa.array(sin, pa.float64())})

    out = (ds.sort(track_col)
             .map_batches(kernel, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    return out.sort_values(track_col).reset_index(drop=True)


# ordered octant cascade (first match wins): half-open 45° sectors
# [k·45°, (k+1)·45°) starting due-East, on integer step vectors —
# mirrored as an ordered CASE in the SQL oracle, so the tie rules on
# axes/diagonals are decided identically in both engines.
_ROSE_SECTORS = ("E", "NE", "N", "NW", "W", "SW", "S", "SE")


def _rose_sector(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    conds = [
        (dx > 0) & (dy >= 0) & (dx > dy),          # E   [0, 45)
        (dy > 0) & (dx > 0) & (dy >= dx),          # NE  [45, 90)
        (dy > 0) & (dx <= 0) & (dy > -dx),         # N   [90, 135)
        (dx < 0) & (dy > 0) & (dy <= -dx),         # NW  [135, 180)
        (dx < 0) & (dy <= 0) & (dy > dx),          # W   [180, 225)
        (dy < 0) & (dx < 0) & (dy <= dx),          # SW  [225, 270)
        (dy < 0) & (dx >= 0) & (-dy > dx),         # S   [270, 315)
        (dy < 0) & (dx > 0) & (dy >= -dx),         # SE  [315, 360)
    ]
    return np.select(conds, np.arange(8), default=-1)


def direction_rose(ds, track_col: str = "user_id",
                   order_cols=("ts", "event_id"),
                   lat_col: str = "lat", lon_col: str = "lon",
                   scale: int = 8) -> pd.DataFrame:
    """Per-track compass rose: step counts in the eight half-open 45°
    octants (due-East start, ties resolved by the ordered cascade
    above) over ×scale integer step vectors — the movement-direction
    histogram of trajectory analytics, integer-exact end to end
    (zero-length steps are excluded; they have no direction).

    Scale shape: the same single track-keyed sort exchange as
    :func:`track_sinuosity`; after it every per-track count is
    block-local, so the kernel's masked lag diffs + ordered
    ``np.select`` + one in-block groupby produce the final
    (track, sector, n_steps) rows with NO second shuffle.

    → pandas (track, sector, n_steps), nonzero sectors only, sorted."""
    from .partition import key_segments

    o1, o2 = order_cols

    out_schema = pa.schema([pa.field(track_col, pa.int64()),
                            pa.field("sector", pa.string()),
                            pa.field("n_steps", pa.int64())])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        u = np.asarray(t[track_col], np.int64)
        k1 = np.asarray(t[o1].cast(pa.timestamp("us")).cast(pa.int64())
                        if pa.types.is_timestamp(t.schema.field(o1).type)
                        else t[o1], np.int64)
        k2 = np.asarray(t[o2], np.int64)
        x = np.rint(np.asarray(t[lon_col], np.float64) * scale) \
            .astype(np.int64)
        y = np.rint(np.asarray(t[lat_col], np.float64) * scale) \
            .astype(np.int64)
        order = np.lexsort((k2, k1, u))
        u, x, y = u[order], x[order], y[order]
        same = u[1:] == u[:-1]
        dx = np.diff(x)[same]
        dy = np.diff(y)[same]
        uu = u[1:][same]
        sec = _rose_sector(dx, dy)
        keep = sec >= 0                        # drop zero-length steps
        uu, sec = uu[keep], sec[keep]
        df = (pd.DataFrame({"u": uu, "s": sec, "n": 1})
              .groupby(["u", "s"], sort=True).sum().reset_index())
        return pa.table({
            track_col: pa.array(df["u"], pa.int64()),
            "sector": pa.array(
                np.array(_ROSE_SECTORS, object)[df["s"].to_numpy()],
                pa.string()),
            "n_steps": pa.array(df["n"], pa.int64())})

    out = (ds.sort(track_col)
             .map_batches(kernel, batch_format="pyarrow",
                          batch_size=None)
             .to_pandas())
    return out.sort_values([track_col, "sector"]) \
              .reset_index(drop=True)


def deviational_ellipse(ds, track_col: str = "user_id",
                        lat_col: str = "lat", lon_col: str = "lon",
                        scale: int = 8) -> pd.DataFrame:
    """Standard deviational ellipse per track (Lefever 1926) — the
    classic GIS directional-dispersion summary: centre of mass,
    orientation of the major axis, and the two semi-axis variances,
    all from second-order moments of the ×scale integer coordinates.

    Scale shape: moments are ADDITIVE, so this is the cheapest member
    of the movement family — per-block integer partials
    (n, Σx, Σy, Σx², Σy², Σxy) → one narrow groupby sum → a stateless
    closing map. No sort exchange, no ordering requirement.

    Closing expressions (shared IEEE, one per output column) over the
    exact int64 moments, with central moments m_xx = Σx² − (Σx)²/n
    etc.:

        theta  = atan2(2·m_xy, m_xx − m_yy) / 2
        disc   = sqrt((m_xx − m_yy)² + 4·m_xy²)
        var_maj = (m_xx + m_yy + disc) / (2n)
        var_min = (m_xx + m_yy − disc) / (2n)

    int64 bound: |coord·scale| ≤ 2¹⁶ here ⇒ x² ≤ 2³², safe to ~2³⁰
    rows per track (beyond: the Python-int HUGEINT combine of
    ``trend_by_key``). → pandas (track, n, cx, cy, theta, var_maj,
    var_min) sorted."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        u = np.asarray(t[track_col], np.int64)
        x = np.rint(np.asarray(t[lon_col], np.float64) * scale) \
            .astype(np.int64)
        y = np.rint(np.asarray(t[lat_col], np.float64) * scale) \
            .astype(np.int64)
        df = pd.DataFrame({track_col: u, "n": 1, "sx": x, "sy": y,
                           "sxx": x * x, "syy": y * y, "sxy": x * y})
        g = df.groupby(track_col, sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby(track_col)
         .aggregate(Sum("n", alias_name="n"),
                    Sum("sx", alias_name="sx"),
                    Sum("sy", alias_name="sy"),
                    Sum("sxx", alias_name="sxx"),
                    Sum("syy", alias_name="syy"),
                    Sum("sxy", alias_name="sxy")))

    def close(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"], np.int64).astype(np.float64)
        sx = np.asarray(t["sx"], np.int64).astype(np.float64)
        sy = np.asarray(t["sy"], np.int64).astype(np.float64)
        sxx = np.asarray(t["sxx"], np.int64).astype(np.float64)
        syy = np.asarray(t["syy"], np.int64).astype(np.float64)
        sxy = np.asarray(t["sxy"], np.int64).astype(np.float64)
        mxx = sxx - sx * sx / n
        myy = syy - sy * sy / n
        mxy = sxy - sx * sy / n
        # atan2 is the one kernel DuckDB and numpy disagree on in
        # the last ulp (measured) — round to 9 dp on both sides
        theta = np.round(np.arctan2(2.0 * mxy, mxx - myy) / 2.0, 9)
        disc = np.sqrt((mxx - myy) * (mxx - myy) + 4.0 * mxy * mxy)
        return pa.table({
            track_col: t[track_col].combine_chunks(),
            "n": t["n"].combine_chunks(),
            "cx": pa.array(sx / n, pa.float64()),
            "cy": pa.array(sy / n, pa.float64()),
            "theta": pa.array(theta, pa.float64()),
            "var_maj": pa.array((mxx + myy + disc) / (2.0 * n),
                                pa.float64()),
            "var_min": pa.array((mxx + myy - disc) / (2.0 * n),
                                pa.float64())})

    out = m.map_batches(close, batch_format="pyarrow").to_pandas()
    return out.sort_values(track_col).reset_index(drop=True)
