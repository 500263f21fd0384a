"""Per-partition checkpointed Parquet sink (north_rule: "explicit
per-partition checkpoints and lineage/metrics records so any failed
partition resumes without recomputation").

Layout under ``out_dir``:

- ``part-<pid>.parquet`` — one file per partition (block), written to a
  ``.tmp`` name first and atomically renamed (idempotent against retries,
  SURVEY.md §4.2).
- ``_manifest/<pid>.json`` — lineage/metrics record
  ``{partition_id, row_count, bytes, checksum, status, key_range}``
  written after the data rename (write-ahead of nothing: the data file is
  the source of truth, the manifest marks it done).

``partition_id`` is a content key: blake2 of the partition's key column
values. Re-running the same pipeline over the same input reproduces the
same pids, so finished partitions are skipped at the sink (the cheap,
storage-level half of resume); a reader-side fragment filter can skip the
corresponding *input* fragments when pids are derived from fragment paths
(pass ``pid_fn``).

The writer itself is a streaming ``map_batches`` stage — no driver-side
collection, any number of partitions.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _default_pid(batch: pa.Table, key_col: str) -> str:
    """Content pid: blake2 over ALL key values (vectorized row hashes, not
    a head/tail sample — two partitions agreeing on a sample can no longer
    collide, ADVICE r01).

    Precondition (documented, not assumed): content pids give exact resume
    only when the pipeline reproduces identical block boundaries run to run
    (map-only pipelines over the same input files). After wide ops /
    re-split reads, use :func:`checkpointed_write_by_key`, whose partition
    membership is a pure key function.
    """
    import numpy as np
    import pandas as pd
    vals = batch.column(key_col).to_numpy(zero_copy_only=False)
    try:
        hv = pd.util.hash_array(vals)
    except TypeError:
        hv = pd.util.hash_array(
            np.array([str(v) for v in vals], dtype=object))
    h = hashlib.blake2b(digest_size=10)
    h.update(len(batch).to_bytes(8, "little"))
    h.update(np.ascontiguousarray(hv).tobytes())
    return h.hexdigest()


def read_manifest(out_dir: str) -> dict[str, dict]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    rec = json.load(fh)
                if rec.get("status") == "done":
                    out[rec["partition_id"]] = rec
            except (json.JSONDecodeError, OSError):
                continue  # torn write → treated as not-done, rewritten
    return out


def checkpointed_write(ds, out_dir: str, key_col: str = "doc_id",
                       pid_fn=None, metrics_cols: tuple = ()):
    """Write ``ds`` to ``out_dir`` with per-partition checkpoints; skips
    partitions already marked done. Returns {written, skipped, rows}.

    ``metrics_cols``: columns whose per-partition top-value histograms are
    recorded in the manifest (e.g. a cell column — these metrics feed the
    hot-cell salt factor of downstream shuffles, SURVEY.md §4.2)."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    done = set(read_manifest(out_dir))
    pid_of = pid_fn or (lambda b: _default_pid(b, key_col))

    def _histogram(batch: pa.Table, col: str, top: int = 20) -> dict:
        import pyarrow.compute as pc
        vc = batch.column(col).value_counts()
        pairs = sorted(((str(v["values"]), int(v["counts"]))
                        for v in vc.to_pylist()),
                       key=lambda kv: -kv[1])[:top]
        return dict(pairs)

    def write_part(batch: pa.Table) -> pa.Table:
        pid = pid_of(batch)
        status = "skipped"
        if pid not in done:
            data_path = os.path.join(out_dir, f"part-{pid}.parquet")
            tmp = data_path + ".tmp"
            pq.write_table(batch, tmp)
            os.replace(tmp, data_path)
            rec = {
                "partition_id": pid,
                "row_count": len(batch),
                "bytes": os.path.getsize(data_path),
                "checksum": pid,
                "status": "done",
                "key_range": [str(batch.column(key_col)[0]),
                              str(batch.column(key_col)[-1])] if len(batch) else [],
                "metrics": {c: _histogram(batch, c) for c in metrics_cols
                            if c in batch.column_names},
            }
            mtmp = os.path.join(out_dir, "_manifest", f"{pid}.json.tmp")
            with open(mtmp, "w") as fh:
                json.dump(rec, fh)
            os.replace(mtmp, os.path.join(out_dir, "_manifest", f"{pid}.json"))
            status = "written"
        return pa.table({"partition_id": pa.array([pid]),
                         "rows": pa.array([len(batch)], pa.int64()),
                         "status": pa.array([status])})

    stats = ds.map_batches(write_part, batch_format="pyarrow").to_pandas()
    return {
        "written": int((stats["status"] == "written").sum()),
        "skipped": int((stats["status"] == "skipped").sum()),
        "rows": int(stats["rows"].sum()),
    }


def checkpointed_write_by_key(ds, out_dir: str, part_col: str,
                              sort_within: list | None = None):
    """Key-partitioned resumable sink: one file per distinct ``part_col``
    value, written from a ``groupby`` shuffle so partition membership — and
    therefore the partition id — is a pure function of the data, not of
    block boundaries.

    This is the writer to use after wide operations: a content-hashed pid
    (``checkpointed_write``) is only stable for deterministic-partition
    (map-only) pipelines, while a global ``sort`` samples its range
    boundaries and splits blocks differently run to run. Keyed partitions
    resume exactly: re-running skips every finished key.
    """
    import re as _re

    import pandas as pd

    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    done = read_manifest(out_dir)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        raw_key = str(g[part_col].iloc[0])
        # sanitized name + short content hash: distinct raw keys that
        # sanitize identically ('a b' vs 'a_b', 'x/1' vs 'x_1') can no
        # longer collide to one pid (ADVICE r01); the raw key is stored in
        # the manifest and verified on skip.
        pid = (_re.sub(r"[^A-Za-z0-9_.-]", "_", raw_key) + "-"
               + hashlib.blake2b(raw_key.encode("utf-8", "replace"),
                                 digest_size=4).hexdigest())
        status = "skipped"
        prev = done.get(pid)
        if prev is not None and prev.get("key") != raw_key:
            prev = None   # hash collision (astronomically unlikely): rewrite
        if prev is None:
            if sort_within:
                g = g.sort_values(sort_within)
            data_path = os.path.join(out_dir, f"part-{pid}.parquet")
            tmp = data_path + ".tmp"
            g.to_parquet(tmp)
            os.replace(tmp, data_path)
            rec = {"partition_id": pid, "row_count": len(g),
                   "bytes": os.path.getsize(data_path), "checksum": pid,
                   "status": "done", "key": raw_key}
            mtmp = os.path.join(out_dir, "_manifest", f"{pid}.json.tmp")
            with open(mtmp, "w") as fh:
                json.dump(rec, fh)
            os.replace(mtmp, os.path.join(out_dir, "_manifest", f"{pid}.json"))
            status = "written"
        return pd.DataFrame({"partition_id": [pid], "rows": [len(g)],
                             "status": [status]})

    stats = ds.groupby(part_col).map_groups(
        write_group, batch_format="pandas").to_pandas()
    return {
        "written": int((stats["status"] == "written").sum()),
        "skipped": int((stats["status"] == "skipped").sum()),
        "rows": int(stats["rows"].sum()),
    }


def lineage_report(out_dir: str) -> dict:
    """Aggregate the per-partition manifests into one lineage/metrics
    record (north_rule: "per-partition lineage + metrics records"):
    totals plus per-partition rows/bytes/key-range, ready to log or store
    next to the sink output."""
    parts = read_manifest(out_dir)
    rows = sum(p.get("row_count", 0) for p in parts.values())
    size = sum(p.get("bytes", 0) for p in parts.values())
    return {
        "out_dir": out_dir,
        "partitions": len(parts),
        "rows": rows,
        "bytes": size,
        "partition_index": {
            pid: {"rows": p.get("row_count", 0), "bytes": p.get("bytes", 0),
                  "key": p.get("key", p.get("key_range"))}
            for pid, p in sorted(parts.items())
        },
    }
