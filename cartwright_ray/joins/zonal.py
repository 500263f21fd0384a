"""Raster↔vector zonal statistics (north_rule "rasterio-backed raster↔vector
zonal stats"; reference's raster-awareness is the grid-resolution analysis,
`cartwright/analysis/space_resolution.py:29-107`).

rasterio is unavailable in this environment, so the raster source is a
seam: ``tile_fn(z, x, y) -> (64, 64) float32`` pixel array. The default
:func:`synth_tile_pixels` is a deterministic synthetic raster (FIXTURES.md
F5); a rasterio-backed ``tile_fn`` drops in unchanged on a real cluster.

Physical plan: the *tile space* is the dataset — the driver enumerates the
tile ids covering the polygons' bboxes (metadata-sized), Ray shards them;
each actor loads/generates its tiles, rasterizes the polygon masks
(vectorized PIP over the pixel-center grid) and emits per-(polygon, tile)
partial sums; a small ``groupby(admin_id)`` combines partials into final
count/sum/min/max/mean. Raster pixels never leave the workers.

Verified against :func:`brute_force_zonal`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.mercator import MAX_LAT
from ..geo.pip import points_in_polygon, polygon_bbox

TILE_SIZE = 64


def synth_tile_pixels(z: int, x: int, y: int, size: int = TILE_SIZE) -> np.ndarray:
    """Deterministic synthetic raster tile: smooth field + seeded noise."""
    rng = np.random.default_rng((z * 73_856_093) ^ (x * 19_349_663) ^ (y * 83_492_791))
    px = np.linspace(x, x + 1, size, endpoint=False)
    py = np.linspace(y, y + 1, size, endpoint=False)
    gx, gy = np.meshgrid(px, py)
    n = 1 << z
    field = np.sin(2 * np.pi * gx / n * 3) * np.cos(2 * np.pi * gy / n * 2) * 50 + 100
    return (field + rng.normal(0, 1.0, (size, size))).astype(np.float32)


def integer_tile_pixels(z: int, x: int, y: int, size: int = TILE_SIZE) -> np.ndarray:
    """SQL-replayable integer raster: pixel value = (gx*7 + gy*13) % 1000
    over GLOBAL pixel indices — exact in float32 and in DuckDB integer
    arithmetic, so the oracled zonal/pyramid queries can enumerate the
    same pixels with generate_series. Lives in the package (not
    ``__ray_entry__``) because the tile_fn is executed on WORKERS: a
    module-level function from ``__ray_entry__`` pickles by reference to
    a module workers cannot import under the driver's
    init-before-import lineage."""
    ix = x * size + np.arange(size, dtype=np.int64)
    iy = y * size + np.arange(size, dtype=np.int64)
    gx, gy = np.meshgrid(ix, iy)
    return ((gx * 7 + gy * 13) % 1000).astype(np.float32)


def _tile_pixel_lonlat(z: int, x: int, y: int, size: int = TILE_SIZE):
    """(lat, lon) of pixel centers of tile (z, x, y)."""
    n = float(1 << z)
    xs = (x + (np.arange(size) + 0.5) / size) / n
    ys = (y + (np.arange(size) + 0.5) / size) / n
    lon = xs * 360.0 - 180.0
    lat = np.rad2deg(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * ys))))
    glon, glat = np.meshgrid(lon, lat)
    return glat, glon


def _tiles_for_bbox(lat0, lat1, lon0, lon1, zoom: int):
    from ..geo.mercator import lonlat_to_tile
    lat0c, lat1c = np.clip([lat0, lat1], -MAX_LAT, MAX_LAT)
    xs, ys = lonlat_to_tile(np.array([lon0, lon1]), np.array([lat0c, lat1c]), zoom)
    # y grows southward
    x_lo, x_hi = int(xs.min()), int(xs.max())
    y_lo, y_hi = int(ys.min()), int(ys.max())
    return [(zoom, x, y) for x in range(x_lo, x_hi + 1)
            for y in range(y_lo, y_hi + 1)]


def _partials_for_tile(z, x, y, polygons, tile_fn):
    pixels = tile_fn(z, x, y)
    size = pixels.shape[0]
    glat, glon = _tile_pixel_lonlat(z, x, y, size)
    flat_lat, flat_lon = glat.ravel(), glon.ravel()
    flat_pix = pixels.ravel().astype(np.float64)
    rows = []
    for poly in polygons:
        b = polygon_bbox(poly["ring_lat"], poly["ring_lon"])
        # bbox reject
        if (glat.max() < b[0] or glat.min() > b[1]
                or glon.max() < b[2] or glon.min() > b[3]):
            continue
        m = points_in_polygon(flat_lat, flat_lon,
                              poly["ring_lat"], poly["ring_lon"])
        if not m.any():
            continue
        vals = flat_pix[m]
        rows.append({"admin_id": poly["admin_id"], "px_count": int(m.sum()),
                     "px_sum": float(vals.sum()), "px_min": float(vals.min()),
                     "px_max": float(vals.max())})
    return rows


class _ZonalActor:
    def __init__(self, polygons_ref, tile_fn):
        import ray
        self.polygons = (ray.get(polygons_ref)
                         if not isinstance(polygons_ref, list) else polygons_ref)
        self.tile_fn = tile_fn

    _SCHEMA = pa.schema([("admin_id", pa.string()),
                         ("px_count", pa.int64()),
                         ("px_sum", pa.float64()),
                         ("px_min", pa.float64()),
                         ("px_max", pa.float64())])

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for z, x, y in zip(batch["z"].to_pylist(), batch["x"].to_pylist(),
                           batch["y"].to_pylist()):
            rows.extend(_partials_for_tile(z, x, y, self.polygons, self.tile_fn))
        if not rows:
            # explicit-schema empty table: schema-less empty RefBundles
            # destabilize streaming schema inference (VERDICT r02 minor)
            return self._SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=self._SCHEMA)


def zonal_stats(polygons: list[dict], zoom: int = 8,
                tile_fn=synth_tile_pixels, concurrency: int | None = None):
    """Per-polygon raster stats as a small result Dataset
    (admin_id, px_count, mean, min, max). ``concurrency`` is retained
    for API compatibility; the stage runs as TASKS (Ray sizes the
    parallelism), see ``zonal_task`` below."""
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    tiles = set()
    for poly in polygons:
        b = polygon_bbox(poly["ring_lat"], poly["ring_lon"])
        tiles.update(_tiles_for_bbox(*b, zoom))
    tiles = sorted(tiles)
    ds = ray.data.from_items(
        [{"z": z, "x": x, "y": y} for z, x, y in tiles])

    import ray
    polygons_ref = ray.put(polygons)

    def zonal_task(batch: pa.Table, _ref=polygons_ref,
                   _fn=tile_fn) -> pa.Table:
        # TASKS, not an actor pool: the "state" is one plasma get of the
        # polygon list — pool ramp-up dominated the query at benchmark
        # scale (same trade as pip_join/_radius_task)
        return _ZonalActor(_ref, _fn)(batch)

    partials = ds.map_batches(zonal_task, batch_format="pyarrow",
                              batch_size=8)

    agg = partials.groupby("admin_id").aggregate(
        Sum("px_count", alias_name="px_count"),
        Sum("px_sum", alias_name="px_sum"),
        Min("px_min", alias_name="px_min"),
        Max("px_max", alias_name="px_max"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mean = pc.divide(batch["px_sum"], pc.cast(batch["px_count"], pa.float64()))
        return batch.append_column("px_mean", mean)

    return agg.map_batches(finish, batch_format="pyarrow")


def brute_force_zonal(polygons: list[dict], zoom: int = 8,
                      tile_fn=synth_tile_pixels) -> dict:
    """Single-threaded oracle: same math, no Ray."""
    acc: dict[str, dict] = {}
    tiles = set()
    for poly in polygons:
        b = polygon_bbox(poly["ring_lat"], poly["ring_lon"])
        tiles.update(_tiles_for_bbox(*b, zoom))
    for z, x, y in sorted(tiles):
        for row in _partials_for_tile(z, x, y, polygons, tile_fn):
            a = acc.setdefault(row["admin_id"],
                               {"px_count": 0, "px_sum": 0.0,
                                "px_min": np.inf, "px_max": -np.inf})
            a["px_count"] += row["px_count"]
            a["px_sum"] += row["px_sum"]
            a["px_min"] = min(a["px_min"], row["px_min"])
            a["px_max"] = max(a["px_max"], row["px_max"])
    for a in acc.values():
        a["px_mean"] = a["px_sum"] / a["px_count"]
    return acc


def raster_downsample(tiles, zoom: int, out_zoom: int, tile_fn,
                      size: int = TILE_SIZE):
    """Raster pyramid build: downsample ``tiles`` (list of (x, y) ids at
    ``zoom``) to ``out_zoom`` parent tiles by mean-pooling, as a Ray
    pipeline:

    1. the TILE SPACE is the dataset (ids only — pixels never leave the
       workers until reduced): each worker loads/generates its child tile
       via ``tile_fn`` and SUM-pools it over f x f pixel groups
       (f = 2^(zoom-out_zoom)), shrinking it f^2-fold before any shuffle;
    2. one ``groupby`` on the parent tile id assembles the f x f reduced
       blocks into the parent's (size, size) pixel array and emits it
       (binary) plus integer-exact stats (px_sum, blk_min, blk_max —
       int64 sums, so a SQL oracle over an integer raster reproduces
       them bit-for-bit; the mean is px_sum / (size*f)^2).

    Missing children (sparse coverage) leave zero blocks — documented:
    pyramid edges over partial coverage are zero-filled, matching map
    renderers.
    """
    import ray.data

    f = 1 << (zoom - out_zoom)
    if f > size:
        raise ValueError("downsample factor exceeds tile size")
    sub = size // f

    def reduce_tile(batch: pa.Table) -> pa.Table:
        xs = np.asarray(batch["x"], dtype=np.int64)
        ys = np.asarray(batch["y"], dtype=np.int64)
        out = {"px": [], "py": [], "sub_x": [], "sub_y": [], "block": []}
        for x, y in zip(xs, ys):
            px = tile_fn(zoom, int(x), int(y), size).astype(np.int64)
            pooled = px.reshape(sub, f, sub, f).sum(axis=(1, 3))
            out["px"].append(int(x) >> (zoom - out_zoom))
            out["py"].append(int(y) >> (zoom - out_zoom))
            out["sub_x"].append(int(x) & (f - 1))
            out["sub_y"].append(int(y) & (f - 1))
            out["block"].append(pooled.tobytes())
        return pa.table({
            "px": pa.array(out["px"], pa.int64()),
            "py": pa.array(out["py"], pa.int64()),
            "sub_x": pa.array(out["sub_x"], pa.int32()),
            "sub_y": pa.array(out["sub_y"], pa.int32()),
            "block": pa.array(out["block"], pa.binary())})

    def assemble(g: pa.Table) -> pa.Table:
        full = np.zeros((size, size), dtype=np.int64)
        for sx, sy, blk in zip(np.asarray(g["sub_x"]),
                               np.asarray(g["sub_y"]),
                               g["block"].to_pylist()):
            b = np.frombuffer(blk, dtype=np.int64).reshape(sub, sub)
            full[sy * sub:(sy + 1) * sub, sx * sub:(sx + 1) * sub] = b
        return pa.table({
            "x": pa.array([int(g["px"][0].as_py())], pa.int64()),
            "y": pa.array([int(g["py"][0].as_py())], pa.int64()),
            "px_sum": pa.array([int(full.sum())], pa.int64()),
            "blk_min": pa.array([int(full.min())], pa.int64()),
            "blk_max": pa.array([int(full.max())], pa.int64()),
            "pixels": pa.array([(full // (f * f)).astype(np.float32)
                                .tobytes()], pa.binary())})

    ds = ray.data.from_items([{"x": int(x), "y": int(y)} for x, y in tiles])
    # plain tasks (no pool): reduce_tile is stateless and fuses
    return (ds.map_batches(reduce_tile, batch_format="pyarrow")
            .groupby(["px", "py"])
            .map_groups(assemble, batch_format="pyarrow"))
