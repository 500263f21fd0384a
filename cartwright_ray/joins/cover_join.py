"""Cell-cover membership join (engine surface; the reference —
jataware/cartwright — classifies geo columns, `cartwright/categories/
geos.py`, but has no cell algebra): stream points against a broadcast
mixed-precision geohash cell set (typically the output of
``geo/compact.compact_geohash``) — "which cover cell(s) contain this
point", the membership primitive behind cell-algebra filters (H3
``polyfill``-style covers, compacted bbox covers, service areas).

Plan: the cover is the SMALL side by construction (compaction minimizes
it), so it ships once via ``ray.put`` grouped by cell length into sorted
fixed-width byte arrays; each point batch encodes ONE geohash byte
matrix at the deepest cover precision and does one zero-copy prefix
view + ``searchsorted`` membership probe per distinct cover length —
no shuffle, no per-row Python. A point emits one row per matching cover
cell (nested cover cells both match, exactly like prefix semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.geohash import _geohash_bytes


def cover_member_join(points_ds, cover_cells, lat_col: str = "lat",
                      lon_col: str = "lon"):
    """(point columns + ``cover_cell``) for every (point, cover cell)
    prefix match. ``cover_cells``: iterable of geohash strings, mixed
    precisions allowed."""
    import ray

    by_len: dict[int, np.ndarray] = {}
    for c in cover_cells:
        by_len.setdefault(len(c), []).append(str(c))
    if not by_len:
        raise ValueError("empty cover")
    max_len = max(by_len)
    packed = {L: np.sort(np.array(v, dtype=f"S{L}"))
              for L, v in by_len.items()}
    cover_ref = ray.put(packed)

    def probe(t: pa.Table) -> pa.Table:
        cov = ray.get(cover_ref)
        lat = np.asarray(t[lat_col], dtype=np.float64)
        lon = np.asarray(t[lon_col], dtype=np.float64)
        gh = _geohash_bytes(lat, lon, max_len)       # (n, max_len) uint8
        idx_parts, cell_parts = [], []
        for L, cells in cov.items():
            pref = np.ascontiguousarray(gh[:, :L]).view(f"S{L}").ravel()
            pos = np.searchsorted(cells, pref)
            pos[pos == len(cells)] = 0
            m = cells[pos] == pref
            if m.any():
                hit = np.nonzero(m)[0]
                idx_parts.append(hit)
                cell_parts.append(cells[pos[hit]].astype(str))
        if not idx_parts:
            out = t.slice(0, 0)
            return out.append_column("cover_cell",
                                     pa.array([], pa.string()))
        idx = np.concatenate(idx_parts)
        cells = np.concatenate(cell_parts)
        order = np.argsort(idx, kind="stable")
        out = t.take(pa.array(idx[order], pa.int64()))
        return out.append_column("cover_cell",
                                 pa.array(cells[order], pa.string()))

    return points_ds.map_batches(probe, batch_format="pyarrow")
