"""Vectorized JSON scalar-field extraction over string columns — the
shredding fast path every columnar engine special-cases (DuckDB/Spark
extract flat scalar fields without materializing a JSON DOM). Engine
surface beyond the reference (jataware/cartwright infers column TYPES,
`cartwright/categorize.py`; it never extracts nested payloads) — same
RE2-kernel family as the span extractor, ``stages/extract.py``.

Scope (documented, asserted by tests): FLAT scalar fields — numbers,
strings without escaped quotes, booleans, null — addressed by a single
key. The kernel is one RE2 ``pc.extract_regex`` per batch (no per-row
Python, no JSON parser); nested objects/arrays or escaped-quote strings
are out of scope and a caller needing them should shred with a real
parser at ingest. This matches how ``events.props``-style telemetry
payloads are used at scale: one hot scalar pulled out of millions of
tiny JSON blobs.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def _string_pattern(key: str) -> str:
    return rf'"{re.escape(key)}"\s*:\s*"(?P<s>[^"\\]*)"'


def _scalar_pattern(key: str) -> str:
    return (rf'"{re.escape(key)}"\s*:\s*'
            rf'(?P<v>-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?'
            rf'|true|false|null)')


def _group(col, pattern: str, name: str):
    """Matched group text, null where the pattern did not match — two
    RE2 facts handled here: struct children don't inherit the
    struct-level (no-match) nulls, and a NON-participating alternation
    group comes back as "" rather than null (why string and bare-scalar
    values use two separate extractions)."""
    ex = pc.extract_regex(col, pattern)
    g = pc.struct_field(ex, name)
    return pc.if_else(pc.is_valid(ex), g, pa.nulls(len(col), pa.string()))


def json_field(ds, col: str, key: str, out_col: str | None = None,
               out_type: pa.DataType | None = None):
    """Append ``out_col`` (default ``<key>``) extracted from the JSON
    strings in ``col``. Missing keys and JSON ``null`` become null;
    ``out_type`` casts the extracted text (e.g. ``pa.int64()``)."""
    out_col = out_col or key
    sp = _string_pattern(key)
    vp = _scalar_pattern(key)

    def extract(t: pa.Table) -> pa.Table:
        c = t.column(col).combine_chunks()
        s = _group(c, sp, "s")
        v = _group(c, vp, "v")
        # the 'null'-token rewrite applies to the BARE-scalar branch only,
        # BEFORE merging: a genuine JSON string value "null" ({"k": "null"})
        # must survive as the string it is (ADVICE r03)
        v = pc.if_else(pc.equal(v, pa.scalar("null")),
                       pa.nulls(t.num_rows, pa.string()), v)
        raw = pc.if_else(pc.is_valid(s), s, v)
        if out_type is not None:
            raw = raw.cast(out_type)
        return t.append_column(out_col, raw)

    return ds.map_batches(extract, batch_format="pyarrow")
