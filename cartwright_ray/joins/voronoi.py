"""Voronoi assignment / reverse-nearest-neighbor load counting: every
point is assigned to its NEAREST site (the Voronoi tessellation of the
site set) and each site reports how many points chose it — the classic
facility-load / RkNN-count operator (the aggregate dual of the kNN
join in :mod:`.knn_join`, which finds neighbors per query; here the
roles flip and the SITES aggregate over the point corpus).

Scale shape — shuffle-free up to the closing O(sites) groupby:

- sites ship once via ``ray.put`` (a facility table is dimension-sized
  by definition; hundreds of thousands still broadcast fine as two
  int64 arrays);
- each batch computes squared L2 distances in ×``scale`` integer
  coordinates against ALL sites at once (an (N × S) int64 outer
  subtract — for big S swap in a per-batch KD/graticule prefilter, the
  documented scale path of :mod:`.knn_join`), takes the argmin with
  smallest-site-id tie-break, and emits per-block (site, count)
  partials;
- one tiny groupby sums the partials; absent sites surface with
  count 0 driver-side (the site table is already in hand).

Exactness: integer coordinates make d² exact int64, so the nearest
choice and the tie-break are decided on integers — the DuckDB replay
(cross join + row_number over (d2, site)) is value-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def voronoi_counts(points_ds, sites: pd.DataFrame,
                   site_col: str = "site_id",
                   lat_col: str = "lat", lon_col: str = "lon",
                   scale: int = 8) -> pd.DataFrame:
    """→ pandas (site_id, n_points) over ALL sites (0 for sites that
    win no point), sorted by site id. ``sites`` needs columns
    (site_col, lat, lon); coordinates on both sides must be multiples
    of 1/scale (see :func:`..stages.tracks.track_extent`)."""
    import ray
    from ray.data.aggregate import Sum

    sid = np.asarray(sites[site_col], np.int64)
    sx = np.rint(sites[lon_col].to_numpy() * scale).astype(np.int64)
    sy = np.rint(sites[lat_col].to_numpy() * scale).astype(np.int64)
    order = np.argsort(sid)          # ascending ids ⇒ argmin tie-break
    sid, sx, sy = sid[order], sx[order], sy[order]
    sites_ref = ray.put((sid, sx, sy))

    def partial(t: pa.Table) -> pa.Table:
        ids, xs, ys = ray.get(sites_ref)
        if t.num_rows == 0:
            return pa.table({"site_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        px = np.rint(np.asarray(t[lon_col], np.float64) * scale) \
            .astype(np.int64)
        py = np.rint(np.asarray(t[lat_col], np.float64) * scale) \
            .astype(np.int64)
        d2 = (px[:, None] - xs[None, :]) ** 2 \
            + (py[:, None] - ys[None, :]) ** 2
        best = np.argmin(d2, axis=1)      # first minimum = smallest id
        cnt = np.bincount(best, minlength=len(ids)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"site_id": pa.array(ids[nz]),
                         "n": pa.array(cnt[nz])})

    agg = (points_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("site_id")
           .aggregate(Sum("n", alias_name="n_points"))
           .to_pandas())
    out = pd.DataFrame({"site_id": sid}).merge(agg, on="site_id",
                                               how="left")
    out["n_points"] = out["n_points"].fillna(0).astype("int64")
    return out.sort_values("site_id").reset_index(drop=True)
