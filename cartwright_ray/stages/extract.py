"""Span-text extraction — the corpus-scale front-end (SURVEY.md §7.2).

Flattens the ``spans`` list<struct> column (zero-copy Arrow offsets math,
no Python per-row loop) and runs re2-compiled ``pyarrow.compute``
extraction kernels over the text child array:

- decimal "lat, lon" composites (value space of the reference's ``latlong``
  validator, `cartwright/categories/geos.py:161-178`), range-validated
  like V1/V2 (`geos.py:143-157`);
- dates in prioritized strftime patterns from the reference catalog,
  parsed with ``pc.strptime`` → epoch seconds;
- country mentions: ISO2/ISO3 code tokens ``(XX/XXX)`` and full-name
  alternation over the ISO-3166 table;
- geohash tokens, decoded to cell-center coordinates as a fallback point
  source.

First-match-per-span semantics (re2 extract returns the first match; spans
in this corpus carry at most one extractable of each kind). Output is the
narrow extracted-points schema (SURVEY.md §1.2): wide media blobs never
travel past this stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geo.geohash import geohash_decode
from ..resources import COUNTRY_NAMES

COORD_RE = r"(?P<xlat>-?\d{1,2}\.\d{3,8})\s*,\s+(?P<xlon>-?\d{1,3}\.\d{3,8})"
CODES_RE = r"\((?P<a2>[A-Z]{2})/(?P<a3>[A-Z]{3})\)"
GEOHASH_RE = r"geohash (?P<gh>[0-9b-hj-km-np-z]{5,12})"

# prioritized (group, regex, strftime) branches, fused into ONE re2
# alternation so dates cost a single extract pass per batch; branch order
# implements the priority (re2 alternation is leftmost-first).
DATE_PATTERNS = [
    ("d1", r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", "%Y-%m-%d %H:%M:%S"),
    ("d2", r"\d{4}-\d{2}-\d{2}", "%Y-%m-%d"),
    ("d3", r"\d{4}/\d{2}/\d{2}", "%Y/%m/%d"),
    ("d4", r"\d{2}/\d{2}/\d{4}", "%m/%d/%Y"),
    ("d5", r"\d{2}-\d{2}-\d{4}", "%d-%m-%Y"),
    ("d6", r"(?:January|February|March|April|May|June|July|August|September|"
     r"October|November|December) \d{1,2}, \d{4}", "%B %d, %Y"),
]
DATE_RE = "|".join(f"(?P<{g}>{p})" for g, p, _ in DATE_PATTERNS)

_COUNTRY_ALT = "|".join(
    sorted({n.replace("(", r"\(").replace(")", r"\)") for n in COUNTRY_NAMES},
           key=len, reverse=True))
COUNTRY_RE = rf"\b(?P<cname>{_COUNTRY_ALT})\b"

EXTRACT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("lat", pa.float64()),
    ("lon", pa.float64()),
    ("point_src", pa.string()),   # 'coord' | 'geohash' | null
    ("ts", pa.int64()),           # epoch seconds, nullable
    ("country", pa.string()),
    ("iso2", pa.string()),
    ("iso3", pa.string()),
    ("geohash_tok", pa.string()),
])


def _flatten_spans(batch: pa.Table):
    """spans list<struct> → (doc_id per span, span_idx, struct child arrays).

    Pure Arrow offset arithmetic — no per-row Python.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = (spans.chunk(0) if spans.num_chunks == 1
                 else spans.combine_chunks())
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = (doc_ids.chunk(0) if doc_ids.num_chunks == 1
                   else doc_ids.combine_chunks())
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    offsets = np.asarray(spans.offsets)
    starts = offsets[np.asarray(parent)]
    span_idx = (np.arange(len(flat)) - starts + offsets[0] * 0).astype(np.int32)
    # note: list_flatten ignores the leading offset slice only when the
    # array is not a slice; recompute span_idx robustly:
    span_idx = (np.arange(offsets[0], offsets[0] + len(flat)) - starts).astype(np.int32)
    doc_per_span = doc_ids.take(parent)
    return doc_per_span, pa.array(span_idx), flat


def _first_group(ext: pa.StructArray, name: str) -> pa.Array:
    # extract_regex marks non-matches null at the struct level only;
    # propagate that validity into the child field.
    return pc.if_else(pc.is_valid(ext), ext.field(name),
                      pa.scalar(None, pa.string()))


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: corpus batch → extracted-points rows.

    Runs on WHOLE blocks (no internal sub-chunking): an 8k-doc internal
    chunking variant was measured ~25-50% SLOWER at low parallelism —
    pyarrow re-compiles each regex per kernel call, and the fused date +
    country alternations are expensive to build, so fewer, larger kernel
    invocations win over cache-resident intermediates here."""
    doc_per_span, span_idx, flat = _flatten_spans(batch)
    kind = flat.field("kind")
    text = flat.field("text")
    is_text = pc.equal(kind, "text")

    # coordinates
    coord = pc.extract_regex(text, COORD_RE)
    lat = pc.cast(_first_group(coord, "xlat"), pa.float64())
    lon = pc.cast(_first_group(coord, "xlon"), pa.float64())
    in_range = pc.and_kleene(
        pc.and_kleene(pc.greater_equal(lat, -90.0), pc.less_equal(lat, 90.0)),
        pc.and_kleene(pc.greater_equal(lon, -180.0), pc.less_equal(lon, 180.0)))
    lat = pc.if_else(in_range, lat, pa.scalar(None, pa.float64()))
    lon = pc.if_else(in_range, lon, pa.scalar(None, pa.float64()))

    # dates — one fused alternation pass; per-branch strptime on the
    # matched group (re2 fills exactly one branch group per match)
    ts = pa.nulls(len(flat), pa.int64())
    date_ext = pc.extract_regex(text, DATE_RE)
    date_valid = pc.is_valid(date_ext)
    for group, _, fmt in DATE_PATTERNS:
        g = pc.if_else(date_valid, date_ext.field(group),
                       pa.scalar(None, pa.string()))
        g = pc.if_else(pc.equal(g, ""), pa.scalar(None, pa.string()), g)
        parsed = pc.strptime(g, format=fmt, unit="s", error_is_null=True)
        ts = pc.if_else(pc.is_null(ts), pc.cast(parsed, pa.int64()), ts)

    # countries
    codes = pc.extract_regex(text, CODES_RE)
    iso2 = _first_group(codes, "a2")
    iso3 = _first_group(codes, "a3")
    cname = _first_group(pc.extract_regex(text, COUNTRY_RE), "cname")

    # geohash tokens → fallback points. Stay in Arrow: only the (rare)
    # rows that actually need a decode are materialized into Python —
    # building per-row object arrays for the whole batch is allocator-bound
    # at scale.
    gh = _first_group(pc.extract_regex(text, GEOHASH_RE), "gh")
    point_src = pc.if_else(pc.is_valid(lat), pa.scalar("coord"),
                           pa.scalar(None, pa.string()))
    need_fill = pc.and_(pc.is_valid(gh), pc.is_null(lat))
    if pc.sum(need_fill).as_py():
        need_np = np.asarray(need_fill)
        idx = np.nonzero(need_np)[0]
        gh_vals = np.asarray(gh.take(pa.array(idx)).to_pylist(), dtype=object)
        dlat, dlon = geohash_decode(gh_vals)
        lat_np = lat.to_numpy(zero_copy_only=False).astype(np.float64)
        lon_np = lon.to_numpy(zero_copy_only=False).astype(np.float64)
        lat_np[idx] = dlat
        lon_np[idx] = dlon
        # NaN (former nulls) → null again
        lat = pa.array(lat_np, pa.float64(), from_pandas=True)
        lon = pa.array(lon_np, pa.float64(), from_pandas=True)
        point_src = pc.if_else(need_fill, pa.scalar("geohash"), point_src)

    out = pa.Table.from_arrays(
        [pc.cast(doc_per_span, pa.string()), span_idx, lat, lon,
         point_src, ts, cname, iso2, iso3, gh],
        schema=EXTRACT_SCHEMA)

    # keep only text spans that yielded at least one extractable
    keep = pc.and_(
        np.asarray(is_text),
        pc.or_kleene(
            pc.is_valid(out["lat"]),
            pc.or_kleene(
                pc.is_valid(out["ts"]),
                pc.or_kleene(pc.is_valid(out["country"]),
                             pc.is_valid(out["iso3"])))).combine_chunks())
    return out.filter(pc.fill_null(keep, False))


def extract_points(corpus_ds, batch_size: int | None = None):
    """Dataset stage: interleaved corpus → extracted points (streaming).

    ``batch_size=None`` (default) processes whole blocks: blocks are
    already bounded by ``DataContext.target_max_block_size``, and an
    unconstrained map FUSES with the upstream ``ReadParquet`` — with a
    batch_size set, Ray refuses Read→Map fusion (the read may change row
    counts), so every corpus byte takes a round trip through the object
    store before extraction. On this host that handoff alone was ~30% of
    flagship wall time. Pass an explicit batch_size only for corpora with
    oversized rows (e.g. inline media payloads)."""
    return corpus_ds.map_batches(extract_batch, batch_format="pyarrow",
                                 batch_size=batch_size,
                                 zero_copy_batch=True)
