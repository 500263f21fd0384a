"""Span-structure-preserving corpus transforms.

The engine's per-row invariant (BASELINE.json input_hint) is
span-sequence equality: (kind, text, media_ref, order) per document.
These stages TRANSFORM span text while provably preserving everything
else — the list/struct layout is rebuilt from the original offsets
buffer, so span count, order, kinds and media_refs are bit-identical by
construction (asserted in tests, and the redaction query's oracle
reconstructs the full transformed span table).

The redaction itself is one RE2 pass over the flattened text child —
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

COORD_REDACT_RE = r"-?\d{1,2}\.\d{3,8}\s*,\s+-?\d{1,3}\.\d{3,8}"


def redact_coordinates(corpus_ds, replacement: str = "[COORD]"):
    """Replace every decimal "lat, lon" composite in text spans with
    ``replacement``; media spans and span structure are untouched.
    The PII-scrub shape: the same stage body handles emails/phones/ids by
    swapping the pattern."""

    def redact(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = (spans.chunk(0) if spans.num_chunks == 1
                     else spans.combine_chunks())
        flat = pc.list_flatten(spans)
        kind = flat.field("kind")
        text = flat.field("text")
        is_text = pc.equal(kind, "text")
        red = pc.replace_substring_regex(text, COORD_REDACT_RE, replacement)
        new_text = pc.if_else(is_text, red, text)
        struct = pa.StructArray.from_arrays(
            [kind, new_text, flat.field("media_ref"), flat.field("offset")],
            names=["kind", "text", "media_ref", "offset"])
        offsets = spans.offsets
        # a sliced list array's offsets don't start at 0; rebase them onto
        # the flattened child
        off = np.asarray(offsets)
        lists = pa.ListArray.from_arrays(
            pa.array(off - off[0], pa.int32()), struct)
        return pa.Table.from_arrays([batch.column("doc_id"), lists],
                                    names=["doc_id", "spans"])

    return corpus_ds.map_batches(redact, batch_format="pyarrow",
                                 zero_copy_batch=True)


def media_captions(corpus_ds, redact: str | None = "[COORD]"):
    """One row per MEDIA span with the text of its nearest PRECEDING
    text span as the caption — the standard image-caption pairing step
    over interleaved text+media documents (the graft's payload axis).

    Fully vectorized over the flattened span child: the nearest
    preceding text-span index is one ``np.maximum.accumulate`` over
    (text ? flat_index : -1) guarded against crossing document starts;
    captions whose doc has no preceding text span come back null.
    With ``redact`` set, coordinate composites in captions are replaced
    (the :func:`redact_coordinates` pattern) so downstream training
    pairs carry no raw lat/lon.
    """

    def extract(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = (spans.chunk(0) if spans.num_chunks == 1
                     else spans.combine_chunks())
        flat = pc.list_flatten(spans)
        n_flat = len(flat)
        parent = np.asarray(pc.list_parent_indices(spans))
        off = np.asarray(spans.offsets)
        doc_start = (off - off[0])[parent] if n_flat else parent
        span_idx = np.arange(n_flat) - doc_start
        kind = flat.field("kind")
        is_text = np.asarray(pc.equal(kind, "text"))
        is_media = np.asarray(pc.equal(kind, "media"))

        cand = np.where(is_text, np.arange(n_flat), -1)
        prev_text = np.maximum.accumulate(cand) if n_flat else cand
        valid = prev_text >= doc_start          # same-document only

        sel = np.nonzero(is_media)[0]
        texts = flat.field("text")
        if redact is not None:
            texts = pc.replace_substring_regex(texts, COORD_REDACT_RE,
                                               redact)
        cap_idx = prev_text[sel]
        caps = pc.take(texts, pa.array(np.maximum(cap_idx, 0)))
        caps = pc.if_else(pa.array(valid[sel]), caps,
                          pa.nulls(len(sel), pa.string()))
        doc_ids = batch.column("doc_id")
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        return pa.table({
            "doc_id": doc_ids.take(pa.array(parent[sel])),
            "span_idx": pa.array(span_idx[sel].astype(np.int32)),
            "media_ref": pc.take(flat.field("media_ref"), pa.array(sel)),
            "caption": caps,
        })

    return corpus_ds.map_batches(extract, batch_format="pyarrow",
                                 zero_copy_batch=True)
