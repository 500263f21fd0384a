"""URL normalization + URL-keyed dedup — the C4/CCNet-style front door
of a web-scale training-data pipeline (dedupe by normalized URL before
any content pass).

``normalize_urls`` is a fully vectorized Arrow stage: one
``pc.extract_regex`` split (scheme / host / PATH / QUERY — the split
itself separates the path from the query at the first ``?`` and drops
the fragment structurally, ADVICE r04) and a fixed chain of RE2
``replace_substring_regex`` kernels — no Python per row. The normal
form applied (each step deterministic, replayed verbatim by the SQL
oracle):

1. lowercase scheme and host;
2. strip default ports (``:443`` for https, ``:80`` for http);
3. drop the fragment (``#...``);
4. drop tracking params (``utm_*``, ``ref``) wherever they sit in the
   QUERY STRING ONLY — a ``&ref=`` inside a path segment and a
   ``/foo/?bar`` or trailing-slash substring inside a query VALUE are
   never touched, because the rewrites below each see only the
   component they belong to;
5. strip a trailing path slash (also when a query follows).

``url_dedup`` then reuses :func:`..stages.dedup.exact_dedup` on the
normalized column (keep-first by id): both physical plans — driver-merge
broadcast under the row bound, single corpus groupby((h1,h2)) above it —
apply unchanged, so the 100-TB story is the dedup module's.

Rows whose URL does not parse (no ``scheme://host``) get a null
``url_norm`` and are passed through by dedup (null keys never collide).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import exact_dedup

# The split is the component boundary: ``path`` stops at the first
# ``?`` or ``#``; ``query`` (optional — non-participating groups come
# back as "" from Arrow's extract_regex) runs to the fragment, which is
# dropped structurally. Tracking-param and trailing-slash rewrites then
# each see ONLY their own component (ADVICE r04: the old single-`rest`
# form let `&ref=` match inside a path segment and `/\?` / `/$` match
# inside query values, canonicalizing distinct URLs identically).
_SPLIT = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)"
          r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$")


def normalize_url_array(url: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized normal form (see module docstring); null where the
    value is not a ``scheme://host...`` URL."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    ex = pc.extract_regex(url, _SPLIT)
    valid = pc.is_valid(ex)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    host = pc.if_else(pc.equal(scheme, "https"),
                      pc.replace_substring_regex(host, r":443$", ""), host)
    host = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(host, r":80$", ""), host)
    # tracking-param removal operates on the BARE query string (no '?'),
    # in three structure-preserving steps:
    # 1. drop '&'-separated tracking params (never first in the query);
    # 2. a LEADING tracking param followed by another param hands the
    #    lead to that param;
    # 3. a tracking param that was the whole query empties it.
    query = pc.struct_field(ex, "query")
    query = pc.replace_substring_regex(
        query, r"&(?:utm_[a-z0-9]+|ref)=[^&]*", "")
    query = pc.replace_substring_regex(
        query, r"^(?:utm_[a-z0-9]+|ref)=[^&]*&", "")
    query = pc.replace_substring_regex(
        query, r"^(?:utm_[a-z0-9]+|ref)=[^&]*$", "")
    # trailing-slash strip sees only the PATH (query values with '/'s
    # or '?'s are untouched); an emptied query drops its '?' entirely.
    path = pc.replace_substring_regex(pc.struct_field(ex, "path"),
                                      r"/$", "")
    qpart = pc.if_else(pc.equal(query, ""), pa.scalar("", pa.string()),
                       pc.binary_join_element_wise("?", query, ""))
    norm = pc.binary_join_element_wise(
        pc.binary_join_element_wise(scheme, host, "://"), path, qpart, "")
    return pc.if_else(valid, norm, pa.scalar(None, pa.string()))


def normalize_urls(ds, col: str = "url", out_col: str = "url_norm"):
    """Dataset stage: append the normalized form of ``col``."""
    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col,
                                   normalize_url_array(batch.column(col)))
    return ds.map_batches(add, batch_format="pyarrow")


def url_dedup(ds, col: str = "url", id_col: str = "doc_id",
              out_col: str = "url_norm", plan: str = "auto"):
    """Normalize ``col`` then keep the first row (min ``id_col``) per
    normalized URL — exact_dedup's two scale plans apply unchanged.

    Unparseable URLs must ALL survive (they are not duplicates of each
    other), but the content hash treats equal nulls as equal — so the
    dedup key substitutes a per-row-unique sentinel (\\x7f prefix + id —
    \\x7f cannot start a scheme, so no real normal form collides) for
    null ``out_col`` values; ``out_col`` itself stays null in the
    output."""
    normed = normalize_urls(ds, col, out_col)
    key_col = "__url_dedup_key"

    def add_key(batch: pa.Table) -> pa.Table:
        norm = batch.column(out_col)
        sentinel = pc.binary_join_element_wise(
            "\x7finvalid:", pc.cast(batch.column(id_col), pa.string()), "")
        return batch.append_column(key_col, pc.coalesce(norm, sentinel))

    keyed = normed.map_batches(add_key, batch_format="pyarrow")
    kept = exact_dedup(keyed, col=key_col, id_col=id_col, plan=plan)
    return kept.map_batches(lambda t: t.drop_columns([key_col]),
                            batch_format="pyarrow")


def synth_messy_urls(ds, id_col: str = "doc_id", out_col: str = "url"):
    """Deterministic messy-URL column for tests/benchmarks: every
    normalization rule is exercised, and the NORMAL form depends only on
    ``(d%5, d%7, d%4)`` — so a SQL oracle can state the ground truth
    arithmetically instead of replaying the regex chain:
    ``https://site{d%5}.example/p{d%7}?id={d%4}``."""
    def messy(d: int) -> str:
        scheme = "HTTPS" if d % 2 else "https"
        site = f"Site{d % 5}.EXAMPLE" if d % 3 == 0 else \
            f"site{d % 5}.example"
        port = ":443" if d % 5 == 0 else ""
        path = f"/p{d % 7}" + ("/" if d % 4 == 0 else "")
        if d % 6 == 0:
            q = f"?utm_source=s{d % 3}&id={d % 4}"
        elif d % 6 == 3:
            q = f"?id={d % 4}&ref=rss"
        else:
            q = f"?id={d % 4}"
        frag = f"#sec{d % 3}" if d % 7 == 0 else ""
        return f"{scheme}://{site}{port}{path}{q}{frag}"

    def add(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        return batch.append_column(
            out_col, pa.array([messy(int(d)) for d in ids], pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")
