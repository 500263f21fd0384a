"""PII detection + redaction over document text — the privacy pass of
a web-scale training-data pipeline (run before any corpus release;
engine surface — the reference, jataware/cartwright, has no text
layer).

Both stages are ONE ``map_batches`` each: no exchange, no state — the
embarrassingly-parallel shape that streams at any corpus size. All
pattern work is RE2 via Arrow kernels (``pc.count_substring_regex``,
``pc.replace_substring_regex``) — and DuckDB's regexp functions are
RE2 too, so the SQL oracle replays the exact same match semantics
(leftmost, non-overlapping) rather than approximating them.

Pattern scope is the deterministic-detector tier (emails, NANP-style
phone numbers, IPv4 literals): the high-precision subset every
production pipeline runs vectorized. Context-dependent PII (names,
addresses) needs a model pass and is out of scope — the documented
seam is the same one the media codecs use (a clearly-marked boundary,
not a silent gap).

Redaction order is load-bearing and replayed verbatim by the oracle:
emails first (their local parts may contain digit runs), then IPv4,
then phones — each replacement inserts a bracketed token that no later
pattern can match.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, redaction token) — order is the application
# order (module docstring). Patterns avoid constructs RE2 lacks
# (lookaround, backreferences) BY CONSTRUCTION, keeping Arrow and
# DuckDB byte-identical.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
     "[IP]"),
    ("phone",
     r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
     "[PHONE]"),
)


def count_pii_array(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Per-string non-overlapping match counts for every pattern;
    null text counts null (propagated, never zero-filled here — the
    caller decides the null story)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return {name: pc.count_substring_regex(text, pattern)
            for name, pattern, _ in PII_PATTERNS}


def redact_pii_array(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """All-occurrence redaction in the fixed pattern order."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    for _, pattern, token in PII_PATTERNS:
        text = pc.replace_substring_regex(text, pattern, token)
    return text


def pii_signals(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset (id, n_email, n_ipv4, n_phone, has_pii) — one
    streaming pass, int64 counts (0 for null text, has_pii false)."""
    def kernel(t: pa.Table) -> pa.Table:
        counts = count_pii_array(t[text_col])
        zero = pa.scalar(0, pa.int32())
        cols = {id_col: t[id_col]}
        total = None
        for name, _, _ in PII_PATTERNS:
            c = pc.fill_null(counts[name], zero)
            cols[f"n_{name}"] = pc.cast(c, pa.int64())
            total = cols[f"n_{name}"] if total is None \
                else pc.add(total, cols[f"n_{name}"])
        cols["has_pii"] = pc.greater(total, 0)
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")


def pii_redact(ds, text_col: str = "text",
               out_col: str = "text_redacted"):
    """→ the input Dataset with ``out_col`` added (null text stays
    null). The input column is kept — drop it with ``select_columns``
    at the call site when the redacted corpus is the product."""
    def kernel(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, redact_pii_array(t[text_col]))

    return ds.map_batches(kernel, batch_format="pyarrow")
