"""Upsert / CDC merge — apply a change-capture delta to a snapshot
table: per key, the highest-version row wins; a winning DELETE op
tombstones the key. The MERGE INTO primitive of every lakehouse
ingestion pipeline, expressed as one keyed exchange (no per-key
Python, no driver materialization of either side).

Scale shape: snapshot and delta union into one Dataset (schemas must
already align; the snapshot is tagged version/op by the caller's map),
ONE hash exchange on the key co-locates every key's row set, and the
whole-block kernel picks the per-key lexicographic max of
(version, is_delete) — one lexsort across ALL keys in the block —
then drops tombstones. Resolution is pure integer/string compare, so
the DuckDB row_number replay is value-identical.

Determinism contract: (key, version) pairs must be unique (CDC logs
guarantee a total per-key version order); with duplicate versions the
winner among equals is decided by op ('U' < 'D' in the lexmax, i.e. a
same-version delete beats the update — the conservative rule, stated
so the SQL replay can mirror it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def upsert_merge(snapshot_ds, delta_ds, key_col: str,
                 version_col: str = "version", op_col: str = "op"):
    """→ Dataset of merged rows (same schema, minus nothing): per key
    the max-(version, op='D') row, DELETE winners dropped."""
    from .partition import hash_partitioned

    both = snapshot_ds.union(delta_ds)
    parted = hash_partitioned(both, [key_col])
    if parted is None:
        return None

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = np.asarray(t[key_col], np.int64)
        v = np.asarray(t[version_col], np.int64)
        is_del = (t[op_col].to_numpy(zero_copy_only=False)
                  == "D").astype(np.int64)
        order = np.lexsort((is_del, v, k))      # per key: max is last
        ends = np.r_[np.flatnonzero(k[order][1:] != k[order][:-1]),
                     len(k) - 1]
        win = order[ends]
        win = win[np.asarray(is_del[win] == 0)]
        return t.take(pa.array(np.sort(win)))

    return parted.map_batches(kernel, batch_format="pyarrow",
                              batch_size=None)
