"""Grid-density clustering — cell-bucketed DBSCAN over (lat, lon)
points.

Classic DBSCAN is quadratic in the worst case and needs a spatial
index; the grid formulation (points bucketed into ``cell_deg``-degree
graticule cells, a cell with >= ``min_pts`` points is *core*, clusters
are 8-neighborhood connected components of core cells, points in cells
Chebyshev-adjacent to a core cell join that component, everything else
is noise ``-1``) keeps the whole computation in the aggregate/broadcast
shape this engine already uses everywhere:

1. **Count** (map → narrow sort): per-batch partial point counts per
   cell id cross the exchange as ``(cell, n)`` rows; a range sort
   co-locates equal cells and a whole-block segment-sum keeps cells
   with ``n >= min_pts``. Nothing point-proportional shuffles.
2. **Component labeling** (driver, bounded): the core-cell set —
   bounded by ``core_limit``, O(occupied dense cells), orders of
   magnitude below the point count — is labeled by min-cell-id
   pointer-jumping over the 8-neighbor adjacency (pure numpy,
   converges in O(log diameter) rounds). The same O(core) set must be
   broadcast for the labeling pass regardless, so driver labeling adds
   no new scale boundary; past ``core_limit`` the adjacency build and
   labeling belong on ``stages.dedup.connected_components`` with a
   shuffle join on cell id (documented, not needed at survey scale).
3. **Label** (pure map): each point checks its own + 8 neighbor cells
   against the broadcast sorted core array (``np.searchsorted``) and
   takes the smallest adjacent component label, else ``-1``.

The graticule does not wrap: cells at lon -180 and +180 are not
adjacent, and there is no polar cap merge — the documented boundary
semantics (points near the antimeridian belong to their own side).

Cell ids pack ``(ix, iy)`` as ``ix * 2^32 + iy`` with both indices
non-negative (lon+180 / lat+90), so neighbor arithmetic ``±2^32 ± 1``
can only produce ids no real cell holds (iy never reaches 2^32-1) —
out-of-grid neighbors simply miss the membership probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SHIFT = np.int64(2 ** 32)

# core cells are occupied dense cells — bounded by the grid size, far
# below the point count; past this the component step should move to
# the distributed connected-components path
_CORE_LIMIT = 2_000_000


def _cell_ids(lat: np.ndarray, lon: np.ndarray,
              cell_deg: float) -> np.ndarray:
    ix = np.floor((lon + 180.0) / cell_deg).astype(np.int64)
    iy = np.floor((lat + 90.0) / cell_deg).astype(np.int64)
    return ix * _SHIFT + iy


def _neighbor_offsets(include_self: bool) -> np.ndarray:
    offs = [np.int64(dx) * _SHIFT + np.int64(dy)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if include_self or (dx, dy) != (0, 0)]
    return np.array(offs, np.int64)


def _label_components(core: np.ndarray) -> np.ndarray:
    """Min-cell-id component label per core cell (``core`` sorted
    ascending). Pointer-jumping min propagation: labels are INDICES
    into ``core``; since ``core`` is sorted, the converged min index is
    the min cell id of the component."""
    n = len(core)
    labels = np.arange(n)
    edges_i, edges_j = [], []
    for off in _neighbor_offsets(include_self=False):
        nb = core + off
        pos = np.searchsorted(core, nb)
        ok = (pos < n) & (core[np.minimum(pos, n - 1)] == nb)
        edges_i.append(np.flatnonzero(ok))
        edges_j.append(pos[ok])
    ei = np.concatenate(edges_i) if edges_i else np.empty(0, np.int64)
    ej = np.concatenate(edges_j) if edges_j else np.empty(0, np.int64)
    while True:
        new = labels.copy()
        np.minimum.at(new, ei, labels[ej])
        new = np.minimum(new, labels)
        new = new[new]                       # pointer jump
        if np.array_equal(new, labels):
            break
        labels = new
    return core[labels]


def grid_dbscan(ds, cell_deg: float = 5.0, min_pts: int = 2,
                lat_col: str = "lat", lon_col: str = "lon",
                core_limit: int = _CORE_LIMIT):
    """Append a ``cluster`` column (int64): the min core-cell id of the
    cluster the point belongs to, or ``-1`` for noise. Core points get
    their own cell's component; points in non-core cells adjacent to a
    core cell are border points and take the smallest adjacent
    component (for core points the two rules coincide — adjacent core
    cells share a component by construction)."""
    import ray

    def count_partials(t: pa.Table) -> pa.Table:
        lat = np.asarray(t[lat_col], np.float64)
        lon = np.asarray(t[lon_col], np.float64)
        cells, counts = np.unique(_cell_ids(lat, lon, cell_deg),
                                  return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    def core_block(t: pa.Table) -> pa.Table:
        # whole-block segment-sum over the cell-sorted exchange (same
        # equal-keys-co-located contract as exact_dedup's shuffle plan)
        if t.num_rows == 0:
            return t
        c = np.asarray(t["cell"]); n = np.asarray(t["n"])
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        sums = np.add.reduceat(n, starts)
        m = sums >= min_pts
        return pa.table({"cell": pa.array(c[starts][m], pa.int64()),
                         "n": pa.array(sums[m], pa.int64())})

    rows = (ds.map_batches(count_partials, batch_format="pyarrow",
                           zero_copy_batch=True)
              .sort("cell")
              .map_batches(core_block, batch_format="pyarrow",
                           batch_size=None)
              .take_all())
    if len(rows) > core_limit:
        raise ValueError(
            f"{len(rows)} core cells exceed core_limit={core_limit}; "
            "coarsen cell_deg, raise min_pts, or move the component "
            "step to stages.dedup.connected_components")
    core = np.sort(np.array([r["cell"] for r in rows], np.int64))
    comp = _label_components(core) if len(core) else core
    core_ref = ray.put((core, comp))
    probe_offs = _neighbor_offsets(include_self=True)

    def label(t: pa.Table) -> pa.Table:
        C, L = ray.get(core_ref)
        lat = np.asarray(t[lat_col], np.float64)
        lon = np.asarray(t[lon_col], np.float64)
        cells = _cell_ids(lat, lon, cell_deg)
        best = np.full(len(cells), -1, np.int64)
        if len(C):
            for off in probe_offs:
                nb = cells + off
                pos = np.searchsorted(C, nb)
                ok = (pos < len(C)) & (C[np.minimum(pos, len(C) - 1)]
                                       == nb)
                cand = L[pos[ok]]
                cur = best[ok]
                best[ok] = np.where(cur == -1, cand,
                                    np.minimum(cur, cand))
        return t.append_column("cluster", pa.array(best, pa.int64()))

    return ds.map_batches(label, batch_format="pyarrow",
                          zero_copy_batch=True)
