"""Polygon rasterization — burn a polygon table into grid cells by
center-in-polygon test: the vector→raster half of the raster↔vector
pair whose inverse is :mod:`.zonal` (zonal stats = raster→vector). A
cell belongs to every polygon CONTAINING ITS CENTER (the GDAL default
burn rule).

Scale shape: the CELL GRID is the distributed side — generated as a
``ray.data.range`` lineage (no driver-side grid materialization) and
probed against the broadcast polygon table through the shared
:class:`.pip_join.PolygonIndex` worker cache (polygons ship once via
``ray.put``; each batch is one vectorized cover-prefilter + crossing
test). Output is (admin_id, cx, cy) pairs, deduped per admin (a
multi-ring admin can only contain a center in one ring, but the
DISTINCT guard is kept for robustness). For polygon tables past the
broadcast bound, the cell grid hash-exchanges on the cover cell like
``pip_join_counts_shuffle`` — the documented dual-plan boundary.

Exactness: cell centers are exact binary fractions (k/res + half-step
with res a power of two), and containment is the same IEEE crossing
arithmetic as the driver-green ``pip_join_counts`` oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .pip_join import DEFAULT_COVER_RES, PolygonIndex, _TASK_INDEX_CACHE


def rasterize_polygons(polygons: list[dict], cells_per_deg: int = 2,
                       cover_res: int = DEFAULT_COVER_RES,
                       parallelism: int = 32) -> pd.DataFrame:
    """→ pandas (admin_id, cx, cy) sorted — every grid cell (at
    ``cells_per_deg`` cells per degree, power of two) whose center a
    polygon contains. cx ∈ [−180·res, 180·res), cy ∈ [−90·res, 90·res)."""
    import ray
    import ray.data

    res = int(cells_per_deg)
    assert res & (res - 1) == 0, "res must be a power of two"
    nx, ny = 360 * res, 180 * res
    polygons_ref = ray.put(polygons)

    def probe(batch: pa.Table) -> pa.Table:
        key = (polygons_ref.hex(), cover_res)
        index = _TASK_INDEX_CACHE.get(key)
        if index is None:
            if len(_TASK_INDEX_CACHE) > 8:
                _TASK_INDEX_CACHE.clear()
            index = _TASK_INDEX_CACHE.setdefault(
                key, PolygonIndex(ray.get(polygons_ref), cover_res))
        i = np.asarray(batch["id"], np.int64)
        cx = i % nx - nx // 2
        cy = i // nx - ny // 2
        lat = cy / res + 0.5 / res          # exact binary fractions
        lon = cx / res + 0.5 / res
        pidx, admin, _ = index.probe(lat, lon)
        if not len(pidx):
            return pa.table({"admin_id": pa.array([], pa.string()),
                             "cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64())})
        df = pd.DataFrame({"admin_id": np.asarray(admin, object),
                           "cx": cx[pidx], "cy": cy[pidx]}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    grid = ray.data.range(nx * ny, override_num_blocks=parallelism)
    out = grid.map_batches(probe, batch_format="pyarrow").to_pandas()
    return (out.drop_duplicates()
            .sort_values(["admin_id", "cx", "cy"])
            .reset_index(drop=True))
