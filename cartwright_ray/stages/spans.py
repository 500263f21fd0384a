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
