"""Geohash cell-set compaction — the H3 ``compact_cells`` analogue for
base-32 geohash prefixes (jataware/cartwright has no cell algebra at
all; this is engine surface for the tiling family, same group as
``geo/geohash.py`` / ``stages/encode.py``).

``compact(cells)`` rewrites a SET of geohash cells of mixed precision:
any COMPLETE family of 32 sibling cells (same parent prefix, all 32
base-32 child characters present) is replaced by the parent, repeated
level by level until ``min_len``; the output is deduplicated. A compacted
set covers every point the input covered using the minimum number of
prefix cells (the standard compaction used to shrink coverings before
shipping them into a join or an index).

Distributed plan (per precision level, deepest first):

* rows of the current level key on their parent prefix through a
  single-key SORT exchange (task-based; no per-group Python dispatch —
  the whole-block kernel walks parent segments with numpy);
* a segment with all 32 distinct child characters emits the parent once;
  anything else re-emits its distinct children;
* other levels bypass the exchange entirely (streamed filter + union).

Levels are processed in one pass each — a parent emitted at level ``p``
participates in the level ``p-1`` round, so cascading collapses resolve
in ``max_len - min_len`` narrow shuffles, each touching ONLY the cells
of its level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OUT = pa.schema([("cell", pa.string())])


def _level_block(t: pa.Table) -> pa.Table:
    """Whole-block kernel over the parent-sorted exchange of ONE level:
    per parent segment, emit the parent if all 32 children are present,
    else the segment's distinct children."""
    if t.num_rows == 0:
        return _OUT.empty_table()
    cells = t.column("cell").to_numpy(zero_copy_only=False)
    parents = t.column("__parent").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
    ends = np.r_[starts[1:], len(parents)]
    out: list[str] = []
    for s, e in zip(starts, ends):
        kids = np.unique(cells[s:e])
        if len(kids) == 32:
            out.append(parents[s])
        else:
            out.extend(kids.tolist())
    return pa.table({"cell": pa.array(out, pa.string())})


def _dedup_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _OUT.empty_table()
    cells = t.column("cell").to_numpy(zero_copy_only=False)
    return pa.table({"cell": pa.array(np.unique(cells), pa.string())})


def _coalesce(ds, rows_est: int):
    """Tiny-exchange guard (see knn_join_shuffle): Ray's sort emits
    num_blocks x num_partitions shuffle objects, so coalesce small
    inputs to a row-proportional block count."""
    if rows_est < 32_000_000:
        nblk = int(np.clip((rows_est + 65535) // 65536, 2, 1024))
        ds = ds.repartition(nblk)
    return ds


def _sorted_map(ds, key: str, kernel, rows_est: int):
    """Key-sorted exchange + whole-block kernel, with the tiny-exchange
    fast path (see knn_join_shuffle): below the row bound the
    distributed sort's fixed machinery dwarfs the data, so one coalesced
    block + an in-kernel Arrow sort does the same co-location in a
    single task."""
    if rows_est <= 65_536:
        def k2(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _OUT.empty_table()
            return kernel(t.sort_by([(key, "ascending")]))

        return ds.repartition(1).map_batches(
            k2, batch_format="pyarrow", batch_size=None)
    return (_coalesce(ds, rows_est).sort(key)
            .map_batches(kernel, batch_format="pyarrow", batch_size=None))


def _compact_local(cells: np.ndarray, min_len: int,
                   max_len: int) -> np.ndarray:
    """Whole-set compaction in one kernel (tiny-set fast path): same
    level-by-level collapse as the distributed plan, over a distinct
    sorted numpy array. Distinctness makes a complete family exactly a
    32-row parent segment."""
    cells = np.unique(cells.astype(object))
    lens = pc.utf8_length(pa.array(cells, pa.string())).to_numpy()
    for p in range(int(max_len), min_len, -1):
        m = lens == p
        if not m.any():
            continue
        lvl = cells[m]                     # sorted ⇒ parent-segment sorted
        parents = pc.utf8_slice_codeunits(
            pa.array(lvl, pa.string()), 0, p - 1) \
            .to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
        ends = np.r_[starts[1:], len(parents)]
        seg = ends - starts
        complete = seg == 32
        keep_rows = np.repeat(~complete, seg)
        pieces = [cells[~m], lvl[keep_rows], parents[starts[complete]]]
        cells = np.unique(np.concatenate(pieces))
        lens = pc.utf8_length(pa.array(cells, pa.string())).to_numpy()
    return cells


def compact_geohash(ds, cell_col: str = "cell", min_len: int = 1,
                    max_len: int | None = None,
                    small_limit: int = 65_536):
    """Compact a Dataset of geohash cell strings (column ``cell_col``,
    mixed precisions allowed). Returns a Dataset with one ``cell``
    column: the deduplicated compacted set.

    ``max_len`` bounds the deepest level; when None it is discovered
    with one cheap aggregate over string lengths.
    """
    ds = ds.select_columns([cell_col])
    if cell_col != "cell":
        ds = ds.rename_columns({cell_col: "cell"})
    # pin the working set: the length-discovery pass AND the first
    # level's two maps (key_level + rest_level) would each re-run the
    # whole upstream pipeline otherwise. O(cells) in the object store —
    # the set the level loop must rescan anyway.
    ds = ds.materialize()

    def _len_partial(t: pa.Table) -> pa.Table:
        ln = pc.utf8_length(t.column("cell"))
        return pa.table({"mx": pa.array([pc.max(ln).as_py() or 0],
                                        pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = (ds.map_batches(_len_partial, batch_format="pyarrow")
             .take_all())
    total = int(sum(p["n"] for p in parts))
    if total == 0:
        import ray.data
        return ray.data.from_arrow(_OUT.empty_table())
    discovered = int(max(p["mx"] for p in parts))
    max_len = discovered if max_len is None else min(max_len, discovered)

    if total <= small_limit:
        # whole compaction in ONE task: each distributed level costs a
        # fixed materialize/union round (~0.5s measured) regardless of
        # row count — for a set this small the level loop is pure
        # overhead. ``small_limit=0`` forces the distributed plan
        # (tests exercise both).
        def whole(t: pa.Table, _min=min_len, _max=max_len) -> pa.Table:
            out = _compact_local(
                t.column("cell").to_numpy(zero_copy_only=False), _min, _max)
            return pa.table({"cell": pa.array(out, pa.string())})

        return ds.repartition(1).map_batches(
            whole, batch_format="pyarrow", batch_size=None)

    cur = ds
    for p in range(max_len, min_len, -1):
        def key_level(t: pa.Table, p=p) -> pa.Table:
            ln = pc.utf8_length(t.column("cell"))
            lvl = t.filter(pc.equal(ln, p))
            return pa.table({
                "cell": lvl.column("cell"),
                "__parent": pc.utf8_slice_codeunits(lvl.column("cell"),
                                                    0, p - 1),
            })

        def rest_level(t: pa.Table, p=p) -> pa.Table:
            ln = pc.utf8_length(t.column("cell"))
            return pa.table(
                {"cell": t.filter(pc.not_equal(ln, p)).column("cell")})

        collapsed = _sorted_map(
            cur.map_batches(key_level, batch_format="pyarrow"),
            "__parent", _level_block, total)
        cur = (collapsed.union(
            cur.map_batches(rest_level, batch_format="pyarrow"))
            .materialize())

    # final cross-level dedup (a parent emitted by a collapse can also
    # exist verbatim in the input): one exchange on the cell itself
    # (np.unique in the kernel needs no pre-sort on the single-block path)
    if total <= 65_536:
        return cur.repartition(1).map_batches(
            _dedup_block, batch_format="pyarrow", batch_size=None)
    return (_coalesce(cur, total).sort("cell")
            .map_batches(_dedup_block, batch_format="pyarrow",
                         batch_size=None))


def compact_reference(cells, min_len: int = 1) -> set:
    """Driver-side oracle for tests: plain-Python compaction."""
    cur = set(cells)
    max_len = max((len(c) for c in cur), default=0)
    for p in range(max_len, min_len, -1):
        lvl = [c for c in cur if len(c) == p]
        rest = {c for c in cur if len(c) != p}
        by_parent: dict[str, set] = {}
        for c in lvl:
            by_parent.setdefault(c[:-1], set()).add(c)
        out = set()
        for parent, kids in by_parent.items():
            if len(kids) == 32:
                out.add(parent)
            else:
                out |= kids
        cur = rest | out
    return cur


_ALPHA32 = np.array(list("0123456789bcdefghjkmnpqrstuvwxyz"))


def uncompact_geohash(ds, precision: int, cell_col: str = "cell"):
    """Inverse of :func:`compact_geohash`: expand every cell to ALL of
    its descendants at ``precision`` (cells already at it pass through;
    deeper cells are an error — an uncompact target must be at or below
    every input's depth, matching H3 ``uncompact_cells`` semantics).

    Streaming ``map_batches`` expansion — each input row fans out to
    ``32^(precision - len)`` children independently, so no shuffle and
    no state; the blow-up factor is the caller's contract (H3 semantics)
    and block sizes grow by at most ``32^max_gap`` per batch. Output is
    NOT deduplicated (overlapping inputs produce duplicate children,
    exactly like H3); compose with a distinct for set semantics.
    """
    ds = ds.select_columns([cell_col])
    if cell_col != "cell":
        ds = ds.rename_columns({cell_col: "cell"})

    def expand(t: pa.Table) -> pa.Table:
        cells = t.column("cell").to_numpy(zero_copy_only=False)
        if len(cells) == 0:
            return _OUT.empty_table()
        lens = pc.utf8_length(t.column("cell")).to_numpy()
        if (lens > precision).any():
            bad = cells[lens > precision][0]
            raise ValueError(
                f"cell {bad!r} deeper than target precision {precision}")
        parts = []
        for L in np.unique(lens):
            grp = cells[lens == L].astype(object)
            for _ in range(int(precision - L)):
                # one level: outer concat with the 32-char alphabet
                grp = np.char.add(
                    np.repeat(grp.astype(str), 32),
                    np.tile(_ALPHA32, len(grp)))
            parts.append(grp.astype(object))
        out = np.concatenate(parts)
        return pa.table({"cell": pa.array(out, pa.string())})

    return ds.map_batches(expand, batch_format="pyarrow")
