"""Flagship pipeline (SURVEY.md §7.2 minimum slice, grown to the full
north-star chain):

    read documents → interleave into the spans corpus → extract points
    (vectorized regex over span text) → encode cells/tiles (geohash, H3-
    style r5-9, S2, web-mercator) → broadcast PIP join vs admin polygons

Every stage is a streaming ``map_batches``; nothing materializes the
corpus. ``ray.init`` is owned by the caller (driver / bench / tests).
"""

from __future__ import annotations

import ray.data

from ..joins.pip_join import pip_join
from ..sources.synth import ADMIN_POLYGONS, interleave_documents
from ..stages.encode import encode_cells
from ..stages.extract import extract_points


def extracted_points(sf_dir: str, seed: int = 42):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    corpus = interleave_documents(docs, seed=seed)
    return extract_points(corpus)


def encoded_points(sf_dir: str, seed: int = 42):
    return encode_cells(extracted_points(sf_dir, seed))


def flagship_pipeline(sf_dir: str, seed: int = 42, concurrency=None):
    """Full chain ending in the PIP join (inner join rows with
    admin_id/admin_name + cell/tile assignment columns)."""
    return pip_join(encoded_points(sf_dir, seed), ADMIN_POLYGONS,
                    concurrency=concurrency)


def flagship_to_tiles(sf_dir: str, out_dir: str, seed: int = 42,
                      block: int = 16):
    """Full chain + tile-partitioned resumable output: join rows grouped
    into (zoom, x//block, y//block) tile blocks — partition ids are pure
    key functions, so a re-run resumes exactly (north_rule output layout).
    Rows are tile-sorted *within* each partition; a global sort would make
    partition boundaries depend on sampled ranges and break resume
    (see state.checkpoint.checkpointed_write_by_key)."""
    import pyarrow as pa

    from ..state.checkpoint import checkpointed_write_by_key

    joined = flagship_pipeline(sf_dir, seed=seed)

    def add_part(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # fully vectorized key build (VERDICT r04: this was the only
        # per-row Python loop left in the flagship family)
        z = pc.cast(t["tile_z"], pa.string())
        x = pc.cast(pa.array(np.asarray(t["tile_x"], dtype=np.int64)
                             // block), pa.string())
        y = pc.cast(pa.array(np.asarray(t["tile_y"], dtype=np.int64)
                             // block), pa.string())
        part = pc.binary_join_element_wise(
            pc.binary_join_element_wise("z", z, ""), x, y, "-")
        return t.append_column("tile_part", part)

    keyed = joined.map_batches(add_part, batch_format="pyarrow")
    return checkpointed_write_by_key(
        keyed, out_dir, "tile_part",
        sort_within=["tile_z", "tile_x", "tile_y", "doc_id", "span_idx"])
