"""Point-in-polygon join (north_rule: "groupby-on-cell shuffle with salted
hot-cell splitting into a point-in-polygon join against admin-boundary
polygon tables").

Two physical plans, one semantics (generalizing the reference's
membership-lookup joins, `cartwright/categories/geos.py:72-112`, from
name-space to coordinate-space):

- :func:`pip_join` — **broadcast plan** (default): the polygon table is
  small-side; an actor pool builds a cell→polygons cover index once per
  actor (``__init__``) from a ``ray.put`` handle and probes it per batch.
  No shuffle at all — the right plan whenever polygons fit in memory.

- :func:`pip_join_shuffle` — **shuffle plan**: points are hash-partitioned
  by H3-style cell with *salted hot-cell splitting* (a first tiny
  groupby-count pass builds the cell histogram; cells above the cap get a
  per-row salt so no single group exceeds it), then each (cell, salt) group
  runs the same vectorized PIP against the broadcast index. This is the
  pattern for when co-locating by cell matters (e.g. feeding a per-cell
  downstream aggregate); it exists mainly to make the skew machinery real
  and testable.

Both verified against :func:`brute_force_pip` (O(n·m) oracle).

Partitioning assumption: polygons are indexed by cover cells at
``cover_res``; a polygon spanning many cells costs cover-set size, points
probe exactly one cell. Antimeridian polygons must be pre-split into two
lon-normalized rings (see ``sources.synth.ADMIN_POLYGONS``).
"""

from __future__ import annotations

from ..util import _pool

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.hexgrid import R0, SQRT7, _mercator_xy, hex_cell
from ..geo.pip import points_in_polygon, polygon_bbox

DEFAULT_COVER_RES = 4


class PolygonIndex:
    """Cell-cover index over a polygon table (list of dicts with
    admin_id/name/ring_lat/ring_lon). Built once per actor."""

    def __init__(self, polygons: list[dict], cover_res: int = DEFAULT_COVER_RES):
        self.polygons = polygons
        self.cover_res = cover_res
        self.cell_to_polys: dict[int, list[int]] = {}
        self._cover_sorted: list[np.ndarray] = []
        for i, poly in enumerate(polygons):
            cover = self._cover(poly)
            self._cover_sorted.append(np.sort(cover))
            for cell in cover:
                self.cell_to_polys.setdefault(int(cell), []).append(i)
        self._all_cover_sorted = (
            np.unique(np.concatenate(self._cover_sorted))
            if self._cover_sorted else np.empty(0, np.uint64))

    def _cover(self, poly: dict) -> np.ndarray:
        """Cover cells of the polygon's bbox: sample a grid at sub-cell
        spacing IN MERCATOR XY SPACE (the space the hex grid lives in) and
        collect distinct hex cells.

        Sampling in lat/lon degrees under-covers near the poles — mercator
        stretches, so one degree of latitude spans many cells there and a
        degree-step grid skips cells, silently dropping joins (caught by
        the derived-points oracle in round 2)."""
        lat0, lat1, lon0, lon1 = polygon_bbox(poly["ring_lat"], poly["ring_lon"])
        (x0,), (y0,) = _mercator_xy(np.array([lat1]), np.array([lon0]))
        (x1,), (y1,) = _mercator_xy(np.array([lat0]), np.array([lon1]))
        # hex circumradius at cover_res in mercator units; sample at a third
        step = (R0 / SQRT7 ** self.cover_res) / 3.0
        xs = np.arange(x0 - step, x1 + 2 * step, step)
        ys = np.arange(y0 - step, y1 + 2 * step, step)
        gx, gy = np.meshgrid(xs, ys)
        zeros = np.zeros(gx.size)
        return np.unique(hex_cell(zeros, zeros, self.cover_res,
                                  xy=(gx.ravel(), gy.ravel())))

    def probe(self, lat: np.ndarray, lon: np.ndarray):
        """(point_idx, admin_id, name) arrays for all containment matches.

        Per batch: ONE cell encode, then one vectorized pass per polygon —
        candidate selection is a sorted-cover ``searchsorted`` membership
        test over the whole batch (round 2: replaced the per-cell-group
        Python loop, whose iteration count grew with batch cell diversity).
        Batches whose cells intersect no cover are rejected by a global
        membership test first."""
        cells = hex_cell(lat, lon, self.cover_res)
        any_cover = self._all_cover_sorted
        pos = np.searchsorted(any_cover, cells)
        pos[pos >= any_cover.size] = 0
        covered = any_cover[pos] == cells
        if not covered.any():
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=object), np.empty(0, dtype=object))
        cand_idx = np.nonzero(covered)[0]
        ccells = cells[cand_idx]
        # restrict the per-polygon pass to polygons whose cover intersects
        # the batch's distinct cells (cell_to_polys lookup) — keeps the
        # loop O(|polygons touching the batch|), not O(|all polygons|),
        # which matters for large polygon tables (ADVICE r02)
        cand_polys = sorted({pi for c in np.unique(ccells)
                             for pi in self.cell_to_polys.get(int(c), ())})
        out_idx, out_admin, out_name = [], [], []
        for pi in cand_polys:
            poly = self.polygons[pi]
            cover = self._cover_sorted[pi]
            p = np.searchsorted(cover, ccells)
            p[p >= cover.size] = 0
            m = cover[p] == ccells
            if not m.any():
                continue
            idx = cand_idx[m]
            mm = points_in_polygon(lat[idx], lon[idx],
                                   poly["ring_lat"], poly["ring_lon"])
            if mm.any():
                hit = idx[mm]
                out_idx.append(hit)
                out_admin.extend([poly["admin_id"]] * len(hit))
                out_name.extend([poly["name"]] * len(hit))
        if not out_idx:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=object), np.empty(0, dtype=object))
        return (np.concatenate(out_idx),
                np.array(out_admin, dtype=object),
                np.array(out_name, dtype=object))


def _join_batch(batch: pa.Table, index: PolygonIndex) -> pa.Table:
    lat = np.asarray(batch["lat"], dtype=np.float64)
    lon = np.asarray(batch["lon"], dtype=np.float64)
    idx, admin, name = index.probe(lat, lon)
    joined = batch.take(pa.array(idx))
    joined = joined.append_column("admin_id", pa.array(admin, pa.string()))
    joined = joined.append_column("admin_name", pa.array(name, pa.string()))
    return joined


class _PIPActor:
    """Actor-pool callable: index built once per actor from the ray.put
    handle (SURVEY.md §7.3)."""

    def __init__(self, polygons_ref, cover_res: int):
        import ray
        polys = ray.get(polygons_ref) if not isinstance(polygons_ref, list) \
            else polygons_ref
        self.index = PolygonIndex(polys, cover_res)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _join_batch(batch, self.index)


# worker-process-global index cache for the task plan: state is still built
# once per worker (keyed by the broadcast ref), but tasks reuse Ray's warm
# worker pool instead of paying actor-pool startup/ramp per dataset.
_TASK_INDEX_CACHE: dict = {}


def _pip_task(batch: pa.Table, polygons_ref, cover_res: int) -> pa.Table:
    import ray
    key = (getattr(polygons_ref, "hex", lambda: id(polygons_ref))(), cover_res)
    idx = _TASK_INDEX_CACHE.get(key)
    if idx is None:
        if len(_TASK_INDEX_CACHE) > 8:       # bound worker memory: a
            _TASK_INDEX_CACHE.clear()        # long-lived worker running many
        polys = ray.get(polygons_ref) if not isinstance(polygons_ref, list) \
            else polygons_ref                # joins must not hoard indexes
        idx = _TASK_INDEX_CACHE.setdefault(key, PolygonIndex(polys, cover_res))
    return _join_batch(batch, idx)


def pip_join(points_ds, polygons: list[dict],
             cover_res: int = DEFAULT_COVER_RES,
             concurrency: int | None = None, batch_size: int | None = None,
             plan: str = "tasks"):
    """Broadcast PIP join: points Dataset (lat/lon columns) → inner-join
    rows with admin_id/admin_name appended.

    ``plan="tasks"`` (default): stateless tasks + per-worker index cache —
    fuses with upstream maps and starts at full width immediately.
    ``plan="actors"``: explicit actor pool (use when the index is heavy
    enough that per-worker duplication matters).
    """
    import ray
    import functools
    polygons_ref = ray.put(polygons)
    if plan == "tasks":
        return points_ds.map_batches(
            functools.partial(_pip_task, polygons_ref=polygons_ref,
                              cover_res=cover_res),
            batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True)
    return points_ds.map_batches(
        _PIPActor,
        fn_constructor_args=(polygons_ref, cover_res),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(concurrency), zero_copy_batch=True)


# ---------------------------------------------------------------------------
# shuffle plan with salted hot cells
# ---------------------------------------------------------------------------

def salted_keys(ds, cell_col: str, id_col: str = "doc_id",
                cap: int = 50_000, max_salts: int = 256):
    """Append a numeric ``pip_key`` column = ``cell * 256 + salt``: salt
    spreads any cell whose global count exceeds ``cap`` over
    ``ceil(count/cap)`` subkeys (clamped to ``max_salts`` — a cell hotter
    than cap*256 still splits 256 ways, documented bound).

    Pass 1 is a tiny groupby-count (cell histogram); the hot-cell → salt-K
    map is broadcast into the key-assignment map_batches. Fully
    vectorized (VERDICT r02 Next #6): hot-cell membership is a sorted
    ``searchsorted`` probe, the per-row salt is ``pd.util.hash_array``
    over the id column, and the key is int math — no per-row Python and
    no string keys in the shuffle. Cell ids use < 2^53 bits
    (``geo.hexgrid.hex_cell`` packs res<<48), so the *256 shift cannot
    overflow uint64.
    """
    hist = ds.groupby(cell_col).count().to_pandas()
    hot = {int(c): int(min(np.ceil(n / cap), max_salts))
           for c, n in zip(hist[cell_col], hist["count()"]) if n > cap}
    hot_cells = np.array(sorted(hot), dtype=np.uint64)
    hot_k = np.array([hot[int(c)] for c in hot_cells], dtype=np.uint64)

    def assign(batch: pa.Table) -> pa.Table:
        cells = np.asarray(batch[cell_col]).astype(np.uint64)
        salts = np.zeros(len(cells), dtype=np.uint64)
        if hot_cells.size:
            pos = np.minimum(np.searchsorted(hot_cells, cells),
                             hot_cells.size - 1)
            mask = hot_cells[pos] == cells
            if mask.any():
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                idh = pd.util.hash_array(np.asarray(ids[mask]))
                salts[mask] = idh.astype(np.uint64) % hot_k[pos[mask]]
        keys = cells * np.uint64(256) + salts
        return batch.append_column("pip_key", pa.array(keys, pa.uint64()))

    return ds.map_batches(assign, batch_format="pyarrow"), hot


def pip_join_shuffle(points_ds, polygons: list[dict],
                     cover_res: int = DEFAULT_COVER_RES,
                     cap: int = 50_000):
    """Shuffle PIP join: salted groupby on the cover cell, vectorized PIP
    per (cell, salt) group against the broadcast polygon index."""
    import ray

    def add_cell(batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch["lat"], dtype=np.float64)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        return batch.append_column(
            "pip_cell", pa.array(hex_cell(lat, lon, cover_res), pa.uint64()))

    keyed, hot = salted_keys(points_ds.map_batches(
        add_cell, batch_format="pyarrow"), "pip_cell", cap=cap)

    polygons_ref = ray.put(polygons)

    def per_group(t: pa.Table) -> pa.Table:
        # per-worker index cache (module-level — a closure dict would be
        # re-created on every task deserialization)
        key = (getattr(polygons_ref, "hex", lambda: id(polygons_ref))(),
               cover_res)
        index = _TASK_INDEX_CACHE.get(key)
        if index is None:
            if len(_TASK_INDEX_CACHE) > 8:   # same bound as _pip_task
                _TASK_INDEX_CACHE.clear()
            index = _TASK_INDEX_CACHE.setdefault(
                key, PolygonIndex(ray.get(polygons_ref), cover_res))
        lat = np.asarray(t["lat"], dtype=np.float64)
        lon = np.asarray(t["lon"], dtype=np.float64)
        idx, admin, name = index.probe(lat, lon)
        out = t.take(pa.array(idx, pa.int64()))
        out = out.append_column("admin_id", pa.array(admin, pa.string()))
        return out.append_column("admin_name", pa.array(name, pa.string()))

    # the exchange co-locates cells (cache-friendly index probes per
    # task), but the vectorized probe needs no per-group isolation — a
    # whole-block map after the key sort does the same work with one
    # Python call per BLOCK instead of one per (cell, salt) group.
    # Arrow in/out: the pandas round-trip copied every block and emitted
    # object-dtype empties Ray's size estimator warns on.
    out = (keyed.sort("pip_key")
           .map_batches(per_group, batch_format="pyarrow", batch_size=None))
    return out.drop_columns(["pip_key", "pip_cell"])


def brute_force_pip(lat: np.ndarray, lon: np.ndarray,
                    polygons: list[dict]):
    """O(n·m) oracle: (point_idx, admin_id) pairs, every polygon tested."""
    out = []
    for poly in polygons:
        m = points_in_polygon(lat, lon, poly["ring_lat"], poly["ring_lon"])
        for i in np.nonzero(m)[0]:
            out.append((int(i), poly["admin_id"], poly["name"]))
    return sorted(out)
