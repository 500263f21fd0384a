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


def flagship_to_tiles(sf_dir: str, out_dir: str, seed: int = 42):
    """Full chain + tile-ordered resumable output: join rows sorted by
    (tile_z, tile_x, tile_y) — co-locating each tile's rows — written
    through the per-partition checkpoint sink (north_rule output layout)."""
    from ..state.checkpoint import checkpointed_write

    joined = flagship_pipeline(sf_dir, seed=seed)
    tiled = joined.sort(["tile_z", "tile_x", "tile_y"])
    return checkpointed_write(tiled, out_dir, key_col="doc_id",
                              metrics_cols=("h3_r5",))
