"""Cell/tile encoding stage — vectorized ``map_batches`` over extracted
points (north-star: "encode to H3 (res 5-9) and S2 covering cells via
vectorized map_batches" + web-mercator tile assignment).

Pure numpy kernels from ``cartwright_ray.geo``; Arrow → numpy is zero-copy
for the float columns. Stateless → plain tasks, no actor pool needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geo.geohash import geohash_encode_arrow
from ..geo.hexgrid import _mercator_xy, hex_cell
from ..geo.mercator import lonlat_to_tile
from ..geo.s2 import s2_cell_id, s2_token_arrow

HEX_RESOLUTIONS = (5, 6, 7, 8, 9)
DEFAULT_TILE_ZOOM = 12
DEFAULT_S2_LEVEL = 12


def encode_batch(batch: pa.Table, tile_zoom: int = DEFAULT_TILE_ZOOM,
                 s2_level: int = DEFAULT_S2_LEVEL,
                 geohash_precision: int = 9) -> pa.Table:
    """Append geohash / h3_r5..r9 / s2 / tile_z,x,y columns.

    Rows with null lat/lon are dropped (points-only output).
    """
    batch = batch.filter(pc.and_(pc.is_valid(batch["lat"]),
                                 pc.is_valid(batch["lon"])))
    lat = np.asarray(batch["lat"], dtype=np.float64)
    lon = np.asarray(batch["lon"], dtype=np.float64)

    cols = {"geohash": geohash_encode_arrow(lat, lon, geohash_precision)}
    xy = _mercator_xy(lat, lon)   # project once for all hex resolutions
    for r in HEX_RESOLUTIONS:
        cols[f"h3_r{r}"] = pa.array(hex_cell(lat, lon, r, xy=xy), pa.uint64())
    s2 = s2_cell_id(lat, lon, s2_level)
    cols["s2_id"] = pa.array(s2, pa.uint64())
    cols["s2_token"] = s2_token_arrow(s2)
    tx, ty = lonlat_to_tile(lon, lat, tile_zoom)
    cols["tile_z"] = pa.array(np.full(len(lat), tile_zoom, dtype=np.int32))
    cols["tile_x"] = pa.array(tx)
    cols["tile_y"] = pa.array(ty)

    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    return batch


def encode_cells(points_ds, batch_size: int | None = None, **kwargs):
    """Dataset stage: extracted points → points + cell/tile columns.

    ``batch_size=None``: whole-block batches (already bounded by the
    block-size target) keep the stage fusable all the way up to the
    ReadParquet — any explicit batch_size forces the upstream's output
    through the object store (see ``extract.extract_points``)."""
    return points_ds.map_batches(
        lambda b: encode_batch(b, **kwargs),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
