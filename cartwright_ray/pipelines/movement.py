"""Movement-analytics composite — the engine's fourth cross-family
flagship: one pass of the broadcast point-in-polygon machinery feeds
BOTH halves of a per-zone dashboard:

    points → zone assign (broadcast PIP, :mod:`..stages.geofence`)
           ├→ (zone, day) count partials → Mann-Kendall trend per zone
           └→ track-keyed lag exchange → transitions → in/out degrees

Output: one row per zone (including the ``"none"`` outside-world zone)
with total events, incoming/outgoing transition counts and the
Mann-Kendall S of its daily event counts — integers end to end, so the
DuckDB replay (the geofence CTE chain + dense-bin sign self-join) is
bit-exact.

Scale shape: the zone-day and transition tables are zone-bounded
(O(zones × days) and O(zones²) after the per-block partials), so the
closing joins run on driver-side frames of a few hundred rows; the
corpus-sized work is exactly two exchanges (the PIP broadcast map and
the ONE track-keyed sort the transition kernel already needs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.geofence import assign_zones, geofence_transitions


def movement_dashboard(points_ds, polygons: list[dict],
                       track_col: str = "user_id",
                       bin_us: int = 86_400_000_000) -> pd.DataFrame:
    """→ pandas (zone, n_events, n_in, n_out, s_stat) sorted by zone.

    ``points_ds`` needs (track, ts, event_id, lat, lon); consumed
    twice (zone counts + transitions), so callers on recomputed
    lineages should ``materialize()`` upstream — the flagship query
    passes a freshly derived table, where the double scan is two cheap
    parquet reads."""
    from ray.data.aggregate import Sum

    zoned = assign_zones(points_ds, polygons)

    def zd_partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()), np.int64)
        g = (pd.DataFrame({"zone": t["zone"].to_numpy(
                               zero_copy_only=False),
                           "b": ts // bin_us, "n": 1})
             .groupby(["zone", "b"], sort=False).sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    zone_day = (zoned.map_batches(zd_partial, batch_format="pyarrow")
                .groupby(["zone", "b"])
                .aggregate(Sum("n", alias_name="n"))
                .to_pandas())                     # O(zones × days)

    d0, d1 = int(zone_day["b"].min()), int(zone_day["b"].max())
    nbins = d1 - d0 + 1
    zones = sorted(zone_day["zone"].unique())
    dense = np.zeros((len(zones), nbins), np.int64)
    zidx = {z: i for i, z in enumerate(zones)}
    dense[zone_day["zone"].map(zidx).to_numpy(),
          zone_day["b"].to_numpy() - d0] = zone_day["n"].to_numpy()
    s = np.zeros(len(zones), np.int64)
    for j in range(1, nbins):
        s += np.sign(dense[:, j, None] - dense[:, :j]).sum(axis=1)

    trans = geofence_transitions(points_ds, polygons,
                                 track_col=track_col).to_pandas()
    n_in = trans.groupby("to_zone").size() if len(trans) else pd.Series(
        dtype=np.int64)
    n_out = trans.groupby("from_zone").size() if len(trans) \
        else pd.Series(dtype=np.int64)

    out = pd.DataFrame({
        "zone": zones,
        "n_events": dense.sum(axis=1),
        "n_in": [int(n_in.get(z, 0)) for z in zones],
        "n_out": [int(n_out.get(z, 0)) for z in zones],
        "s_stat": s})
    return out.sort_values("zone").reset_index(drop=True)
