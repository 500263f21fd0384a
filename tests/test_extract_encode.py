"""Extraction + encoding unit tests (no Ray) incl. the per-row
span-sequence invariant (BASELINE.json input_hint)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cartwright_ray.sources.synth import (CORPUS_SCHEMA, make_spans, _doc_rng,
                                          synth_corpus_table)
from cartwright_ray.stages.encode import encode_batch
from cartwright_ray.stages.extract import extract_batch


def _mk_corpus(rows):
    return pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.string()),
         pa.array([r[1] for r in rows], CORPUS_SCHEMA.field("spans").type)],
        schema=CORPUS_SCHEMA)


def span(kind, text, ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_extract_known_values():
    corpus = _mk_corpus([
        ("d1", [span("text", "station at 12.34567, -45.67890 reporting"),
                span("text", "observed on 2020-06-29 fine"),
                span("media", "", "media://d1/2")]),
        ("d2", [span("text", "in Kenya (KE/KEN) during survey")]),
        ("d3", [span("text", "nothing to see here")]),
        ("d4", [span("text", "geohash u4pruydq checkpoint")]),
    ])
    out = extract_batch(corpus)
    rows = {(r["doc_id"], r["span_idx"]): r for r in out.to_pylist()}
    r = rows[("d1", 0)]
    assert r["lat"] == 12.34567 and r["lon"] == -45.6789
    assert r["point_src"] == "coord"
    r = rows[("d1", 1)]
    assert r["ts"] == 1593388800  # 2020-06-29 UTC
    r = rows[("d2", 0)]
    assert r["country"] == "Kenya" and r["iso2"] == "KE" and r["iso3"] == "KEN"
    assert ("d3", 0) not in rows
    r = rows[("d4", 0)]
    assert r["point_src"] == "geohash"
    assert abs(r["lat"] - 57.649) < 0.01


def test_out_of_range_coords_rejected():
    corpus = _mk_corpus([
        ("d1", [span("text", "bad point 95.12345, 10.12345 end")]),
    ])
    out = extract_batch(corpus)
    assert out.num_rows == 0


def test_encode_batch_columns():
    corpus = synth_corpus_table(200)
    pts = extract_batch(corpus)
    enc = encode_batch(pts)
    for col in ["geohash", "h3_r5", "h3_r9", "s2_id", "s2_token",
                "tile_z", "tile_x", "tile_y"]:
        assert col in enc.column_names
    assert pc.min(pc.is_valid(enc["lat"])).as_py()  # no null points survive
    # tile bounds at zoom 12
    assert pc.max(enc["tile_x"]).as_py() < 4096
    assert pc.min(enc["tile_x"]).as_py() >= 0


def test_corpus_determinism():
    """Same (seed, doc_id) ⇒ identical spans in any process/partition."""
    a = make_spans("doc-7", _doc_rng(42, "doc-7"), "base text")
    b = make_spans("doc-7", _doc_rng(42, "doc-7"), "base text")
    assert a == b
    t1 = synth_corpus_table(50)
    t2 = synth_corpus_table(50)
    assert t1.equals(t2)


def test_span_sequence_invariant_through_roundtrip(tmp_path):
    """Per-row span-sequence equality (kind, text, media_ref, order) after
    the corpus passes through a parquet write/read cycle (the engine's
    sink format)."""
    import pyarrow.parquet as pq
    corpus = synth_corpus_table(100)
    p = tmp_path / "corpus.parquet"
    pq.write_table(corpus, p)
    back = pq.read_table(p)
    orig = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"])
                          for s in r["spans"]] for r in corpus.to_pylist()}
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"])
                         for s in r["spans"]] for r in back.to_pylist()}
    assert orig == got


def test_redaction_preserves_span_sequence(ray_session):
    """redact_coordinates changes ONLY text-span text: kind, media_ref,
    offset, span order and span counts are bit-identical."""
    import re

    from cartwright_ray.sources.synth import synth_corpus
    from cartwright_ray.stages.spans import (COORD_REDACT_RE,
                                             redact_coordinates)
    before = synth_corpus(80, parallelism=3).to_pandas()
    after = redact_coordinates(
        synth_corpus(80, parallelism=3)).to_pandas()
    b = before.sort_values("doc_id").reset_index(drop=True)
    a = after.sort_values("doc_id").reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    pat = re.compile(COORD_REDACT_RE)
    changed = 0
    for sa, sb in zip(a["spans"], b["spans"]):
        assert len(sa) == len(sb)
        for xa, xb in zip(sa, sb):
            assert xa["kind"] == xb["kind"]
            assert xa["media_ref"] == xb["media_ref"]
            assert xa["offset"] == xb["offset"]
            if xb["kind"] == "text":
                assert xa["text"] == pat.sub("[COORD]", xb["text"])
                changed += xa["text"] != xb["text"]
            else:
                assert xa["text"] == xb["text"]
    assert changed > 0            # the corpus really contains coordinates
