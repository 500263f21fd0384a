"""geofence_transitions — brute-force differential + layout invariance.

The spec is exact: zone = lexicographically smallest admin_id whose
polygon contains the ping under the IEEE even-odd crossing test (the
same arithmetic as joins.pip_join, already oracle-proven), else "none";
emit one row per ping whose zone differs from the previous ping of the
same track ordered by (ts, event_id). The brute oracle below re-derives
both steps with a per-row Python loop; the distributed result must match
it at any block layout, including the adversarial cases: single-ping
tracks (never emit), all-outside tracks, a track whose pings alternate
zones every step, and ties broken by event_id at equal ts.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.sources.synth import ADMIN_POLYGONS
from cartwright_ray.stages.geofence import NO_ZONE, geofence_transitions


def _crossing_inside(lat, lon, ring_lat, ring_lon):
    """Reference even-odd test, same float ops as the engine kernel."""
    inside = False
    n = len(ring_lat)
    for i in range(n):
        j = (i + 1) % n
        yi, yj = ring_lat[i], ring_lat[j]
        xi, xj = ring_lon[i], ring_lon[j]
        if (yi > lat) != (yj > lat):
            if lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
                inside = not inside
    return inside


def _brute(df, polygons):
    zones = []
    for lat, lon in zip(df["lat"], df["lon"]):
        hits = sorted(p["admin_id"] for p in polygons
                      if _crossing_inside(lat, lon,
                                          p["ring_lat"], p["ring_lon"]))
        zones.append(hits[0] if hits else NO_ZONE)
    df = df.assign(zone=zones)
    rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        z = g["zone"].to_numpy()
        e = g["event_id"].to_numpy()
        for k in range(1, len(z)):
            if z[k] != z[k - 1]:
                rows.append((u, e[k], z[k - 1], z[k]))
    return (pd.DataFrame(rows, columns=["user_id", "event_id",
                                        "from_zone", "to_zone"])
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))


def _run(df, polygons, blocks):
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = geofence_transitions(ds, polygons).to_pandas()
    if out.empty:
        return out
    return (out.sort_values(["user_id", "event_id"])
            .reset_index(drop=True).astype({"user_id": np.int64,
                                            "event_id": np.int64}))


def test_matches_brute_and_layout_invariant():
    rng = np.random.default_rng(11)
    n = 800
    # concentrate pings around the synthetic admin area so a healthy
    # fraction actually lands inside polygons (and transitions fire)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 15, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 10_000, n).astype(np.int64),
        "lat": rng.uniform(-60, 60, n),
        "lon": rng.uniform(-150, 60, n)})
    want = _brute(df, ADMIN_POLYGONS)
    assert len(want) > 50                      # the fixture exercises both
    assert (want["from_zone"] != NO_ZONE).any() and \
           (want["to_zone"] != NO_ZONE).any()
    for blocks in (1, 4, 23):
        got = _run(df, ADMIN_POLYGONS, blocks)
        pd.testing.assert_frame_equal(got, want)


def test_edge_cases():
    poly = [{"admin_id": "Z1", "name": "z1",
             "ring_lat": [0.0, 0.0, 10.0, 10.0],
             "ring_lon": [0.0, 10.0, 10.0, 0.0]}]
    df = pd.DataFrame({
        # u0: single ping (never emits); u1: always outside (no emit);
        # u2: alternates inside/outside every step (emits every step);
        # u3: equal ts everywhere — order falls to event_id
        "user_id": np.array([0, 1, 1, 2, 2, 2, 2, 3, 3, 3], np.int64),
        "event_id": np.arange(10, dtype=np.int64),
        "ts": np.array([0, 0, 1, 0, 1, 2, 3, 5, 5, 5], np.int64),
        "lat": [5.0, 50, 51, 5, 50, 5, 50, 5, 50, 5],
        "lon": [5.0, 50, 51, 5, 50, 5, 50, 5, 50, 5]})
    want = _brute(df, poly)
    got = _run(df, poly, 3)
    pd.testing.assert_frame_equal(got, want)
    u2 = want[want["user_id"] == 2]
    assert len(u2) == 3                        # alternation emits each step
    u3 = got[got["user_id"] == 3]
    assert list(u3["event_id"]) == [8, 9]      # tie broken by event_id
    assert not (want["user_id"] == 0).any()
    assert not (want["user_id"] == 1).any()


def test_od_matrix_matches_brute_rollup():
    from cartwright_ray.stages.geofence import od_matrix
    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 10, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 5_000, n).astype(np.int64),
        "lat": rng.uniform(-60, 60, n),
        "lon": rng.uniform(-150, 60, n)})
    want = (_brute(df, ADMIN_POLYGONS)
            .groupby(["from_zone", "to_zone"]).size()
            .rename("n_trips").reset_index()
            .sort_values(["from_zone", "to_zone"]).reset_index(drop=True))
    ds = ray.data.from_pandas(df).repartition(7)
    got = (od_matrix(ds, ADMIN_POLYGONS).to_pandas()
           .sort_values(["from_zone", "to_zone"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_all_outside_emits_nothing():
    poly = [{"admin_id": "Z1", "name": "z1",
             "ring_lat": [80.0, 80.0, 85.0, 85.0],
             "ring_lon": [0.0, 5.0, 5.0, 0.0]}]
    df = pd.DataFrame({
        "user_id": np.zeros(6, np.int64),
        "event_id": np.arange(6, dtype=np.int64),
        "ts": np.arange(6, dtype=np.int64),
        "lat": np.linspace(-50, 50, 6),
        "lon": np.linspace(-50, 50, 6)})
    got = _run(df, poly, 2)
    assert len(got) == 0


def test_movement_dashboard_composes():
    """Dashboard rows must agree with independently computed pieces:
    n_events sums to the point count, in/out degrees match a brute
    transition rollup, and a zone with monotone-rising daily counts
    carries the maximal possible S."""
    from cartwright_ray.pipelines.movement import movement_dashboard
    poly = [{"admin_id": "Z1", "name": "z1",
             "ring_lat": [0.0, 0.0, 10.0, 10.0],
             "ring_lon": [0.0, 10.0, 10.0, 0.0]}]
    rng = np.random.default_rng(79)
    n = 300
    base = pd.Timestamp("2024-01-01").value // 1000
    day = rng.integers(0, 5, n)
    inside = rng.random(n) < (day + 1) / 6.0     # rising in-zone share
    df = pd.DataFrame({
        "user_id": rng.integers(0, 8, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(base + day * 86_400_000_000
                             + rng.integers(0, 86_400_000_000, n),
                             unit="us"),
        "lat": np.where(inside, 5.0, 50.0),
        "lon": np.where(inside, 5.0, 50.0)})
    ds = ray.data.from_pandas(df).repartition(4)
    out = movement_dashboard(ds, poly)
    assert set(out["zone"]) == {"Z1", "none"}
    assert out["n_events"].sum() == n
    # degrees match the brute transition list
    bt = _brute(df, poly)
    for z in ("Z1", "none"):
        row = out.set_index("zone").loc[z]
        assert row["n_in"] == (bt["to_zone"] == z).sum()
        assert row["n_out"] == (bt["from_zone"] == z).sum()
    # rising in-zone share: Z1 daily counts trend up, none trends down
    z1 = out.set_index("zone").loc["Z1", "s_stat"]
    nz = out.set_index("zone").loc["none", "s_stat"]
    assert z1 > 0 and nz < 0


def test_zone_dwell_time_matches_brute():
    from cartwright_ray.stages.geofence import zone_dwell_time
    poly = [{"admin_id": "Z1", "name": "z1",
             "ring_lat": [0.0, 0.0, 10.0, 10.0],
             "ring_lon": [0.0, 10.0, 10.0, 0.0]}]
    rng = np.random.default_rng(101)
    n = 200
    df = pd.DataFrame({
        "user_id": rng.integers(0, 6, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n) * 1_000_000,
                             unit="us"),
        "lat": rng.uniform(-5, 15, n),
        "lon": rng.uniform(-5, 15, n)})
    # brute: per user ordered, interval -> first ping's zone
    zones = []
    for lat, lon in zip(df["lat"], df["lon"]):
        zones.append("Z1" if _crossing_inside(
            lat, lon, poly[0]["ring_lat"], poly[0]["ring_lon"])
            else NO_ZONE)
    bd = df.assign(zone=zones)
    acc = {}
    for _, g in bd.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        z = g["zone"].to_numpy()
        for k in range(len(z) - 1):
            tot, cnt = acc.get(z[k], (0, 0))
            acc[z[k]] = (tot + int(ts[k + 1] - ts[k]), cnt + 1)
    want = (pd.DataFrame([(z, t, c) for z, (t, c) in sorted(acc.items())],
                         columns=["zone", "total_us", "n_intervals"]))
    for blocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (zone_dwell_time(ds, poly).to_pandas()
               .sort_values("zone").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_zonal_mode_matches_brute_with_ties():
    """Majority per zone with the smaller-string tie-break; 'none'
    bucket carries out-of-polygon points."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.geofence import zonal_mode

    polys = [
        {"admin_id": "Z0", "name": "a",
         "ring_lat": [0.0, 0.0, 10.0, 10.0],
         "ring_lon": [0.0, 10.0, 10.0, 0.0]},
        {"admin_id": "Z1", "name": "b",
         "ring_lat": [0.0, 0.0, 10.0, 10.0],
         "ring_lon": [20.0, 30.0, 30.0, 20.0]},
    ]
    rows = []
    # Z0: 3 "x", 3 "y" (tie -> "x"); Z1: 2 "y" 1 "x"; outside: "z"
    for i in range(3):
        rows.append((5.0 + i * 0.1, 5.0, "x"))
        rows.append((2.0 + i * 0.1, 3.0, "y"))
    rows += [(5.0, 25.0, "y"), (6.0, 25.0, "y"), (7.0, 25.0, "x")]
    rows += [(50.0, 50.0, "z"), (51.0, 50.0, "z")]
    df = pd.DataFrame(rows, columns=["lat", "lon", "event_type"])

    want = pd.DataFrame(
        [("Z0", "x", 3, 6), ("Z1", "y", 2, 3), ("none", "z", 2, 2)],
        columns=["zone", "mode_cat", "n_mode", "n_total"])
    for blocks in (1, 4):
        got = zonal_mode(ray.data.from_pandas(df).repartition(blocks),
                         polys)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
