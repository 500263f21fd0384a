"""Key-colocated block utilities shared by vectorized per-key operators.

Ray Data's ``groupby().map_groups`` makes one Python call per key — fine
for hundreds of groups, per-row Python in disguise for millions. The
pattern here instead hash-repartitions on the key with in-block sorting
(``repartition(n, keys=[...], sort=True)``), so EVERY row of a key lands
in one block, key-sorted — and a whole-block ``map_batches`` kernel
(``batch_size=None``) can reduce per-key segments with
``np.minimum.reduceat`` / rank arithmetic, one numpy call per block.

Two Ray sharp edges are handled here:

* key-based repartition requires ``ShuffleStrategy.HASH_SHUFFLE``; the
  DataContext is a per-lineage COPY for ``from_*`` datasets, so the
  strategy flip is scoped to the rebuilt dataset, never global;
* Ray's map operators SKIP the UDF for empty input blocks and emit
  schema-less empty bundles, which poison the hash-repartition
  aggregator (its partition builds as a zero-column table and the key
  sort fails) — ``drop_empty_blocks`` strips them zero-copy first.

The cheaper alternative exchange is ``ds.sort(key)`` (task-based, no
actor pools) — but the sort's range boundaries compare the FULL key
tuple, so sort by EXACTLY the segment-key columns and order within the
key inside the block kernel. Sorting by (key, order_col) can cut one
key's rows across two blocks at a mid-order_col boundary (observed:
user_running_value lost rows under a (user, ts, id) sort; Ray's own
map_groups sorts by the group key alone for the same reason).
"""

from __future__ import annotations

import numpy as np


def drop_empty_blocks(ds):
    """Materialize ``ds`` and rebuild it from the non-empty blocks only.

    Driver-side O(num_blocks) metadata pass; block payloads stay in the
    object store (``from_arrow_refs`` is zero-copy). Returns ``None`` if
    every block is empty.
    """
    import ray.data

    mat = ds.materialize()
    refs = [ref for b in mat.iter_internal_ref_bundles()
            for ref, meta in b.blocks if meta.num_rows]
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def hash_partitioned(ds, keys: list[str], num_partitions: int | None = None,
                     rows_per_partition: int = 100_000):
    """``ds`` hash-repartitioned on ``keys`` with in-block key sorting.

    Every key's rows are co-located in exactly one output block, sorted
    by the keys — the precondition for whole-block segment kernels.
    Involves one materialization (to strip schema-less empty blocks,
    which break the hash-shuffle aggregator). With ``num_partitions``
    unset, partitions are sized from the materialized row count — every
    partition is a shuffle-aggregator actor, which dominates wall time
    when the data is small.
    """
    import ray.data
    from ray.data.context import ShuffleStrategy

    mat = ds.materialize()
    refs, count = [], 0
    for b in mat.iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            if meta.num_rows:
                refs.append(ref)
                count += meta.num_rows
    if not refs:
        return None
    clean = ray.data.from_arrow_refs(refs)
    clean.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if num_partitions is None:
        num_partitions = max(2, min(64, 1 + count // rows_per_partition))
    return clean.repartition(num_partitions, keys=keys, sort=True)


def arrow_schema_of(ds):
    """Arrow schema of a Dataset without a full execution.

    ``Dataset.schema()`` is metadata-cheap and carries Arrow types for
    parquet/arrow-born lineages; pandas/from_items lineages surface
    python or numpy types, where a one-row probe gives the real Arrow
    schema (reads a single block).
    """
    import pyarrow as pa

    sch = ds.schema()
    if all(isinstance(t, pa.DataType) for t in sch.types):
        return pa.schema(list(zip(sch.names, sch.types)))
    return ds.limit(1).take_batch(1, batch_format="pyarrow").schema


def key_segments(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start offsets + per-row segment index of a key-sorted array."""
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    sizes = np.diff(np.r_[starts, key.shape[0]])
    return starts, np.repeat(np.arange(len(starts)), sizes)
