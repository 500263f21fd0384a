"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1).

Builds the north-input corpus (``doc_id: string, spans:
list<struct<kind:string, text:string, media_ref:string, offset:int32>>``)
either standalone (``synth_corpus``) or derived 1:1 from the driver's
``documents.parquet`` table (``interleave_documents`` — a streaming
``map_batches`` over the testdata, so benches scale with sf).

Text spans embed extractables drawn from the cartwright category
generators' value spaces (decimal "lat, lon" composites per
`/root/reference/cartwright/categories/geos.py:161-178`, dates in the
reference's strftime catalog, country names / ISO codes, geohash tokens)
plus distractor prose. Point distribution is a seeded mixture of
uniform-sphere and zipf-weighted hot city centers, to exercise salted
hot-cell splitting downstream.

Everything is keyed on (seed, doc_id) — same input ⇒ byte-identical corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..detectors.registry import DATE_FORMATS
from ..geo.geohash import geohash_encode
from ..resources import COUNTRIES

# hot cities for the zipf-skewed point mixture (lat, lon)
HOT_CITIES = [
    ("Tokyo", 35.6762, 139.6503), ("New York", 40.7128, -74.0060),
    ("London", 51.5074, -0.1278), ("Paris", 48.8566, 2.3522),
    ("Lagos", 6.5244, 3.3792), ("Sao Paulo", -23.5505, -46.6333),
    ("Mumbai", 19.0760, 72.8777), ("Beijing", 39.9042, 116.4074),
    ("Cairo", 30.0444, 31.2357), ("Jakarta", -6.2088, 106.8456),
    ("Mexico City", 19.4326, -99.1332), ("Moscow", 55.7558, 37.6173),
]

_WORDS = ("survey report station observed near region during period value "
          "sample recorded team field data coverage area sector grid note "
          "measurement reading source archive batch record local").split()

# a subset of the reference's date catalog dense enough to exercise the
# extractor; all 46 formats remain available via DATE_FORMATS
_GEN_FORMATS = ["%Y-%m-%d", "%Y/%m/%d", "%m/%d/%Y", "%d-%m-%Y",
                "%Y-%m-%d %H:%M:%S", "%B %d, %Y"]


def _doc_rng(seed: int, doc_id) -> np.random.Generator:
    # stable across processes (python's hash() is per-process salted)
    import hashlib
    h = hashlib.blake2b(f"{int(seed)}|{doc_id}".encode(), digest_size=8)
    return np.random.default_rng(int.from_bytes(h.digest(), "big"))


def _random_point(rng) -> tuple[float, float]:
    if rng.random() < 0.4:
        # zipf-weighted hot city + small jitter
        ranks = np.arange(1, len(HOT_CITIES) + 1, dtype=float)
        w = 1.0 / ranks
        w /= w.sum()
        _, clat, clon = HOT_CITIES[int(rng.choice(len(HOT_CITIES), p=w))]
        return (clat + rng.normal(0, 0.05), clon + rng.normal(0, 0.05))
    # uniform on the sphere (clamped to mercator-friendly lats)
    lat = np.rad2deg(np.arcsin(rng.uniform(-0.996, 0.996)))
    return (float(np.clip(lat, -84.9, 84.9)), rng.uniform(-180, 180))


def _date_str(rng) -> str:
    fmt = _GEN_FORMATS[int(rng.integers(len(_GEN_FORMATS)))]
    import datetime
    base = datetime.datetime(1970, 1, 1) + datetime.timedelta(
        seconds=int(rng.integers(0, 1_700_000_000)))
    return base.strftime(fmt)


def _prose(rng, n) -> str:
    return " ".join(_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n))


def make_spans(doc_id, rng, base_text: str = "") -> list[dict]:
    """Seeded span list for one document."""
    n_spans = int(rng.integers(2, 7))
    spans = []
    offset = 0
    for i in range(n_spans):
        if rng.random() < 0.2:
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"media://{doc_id}/{i}",
                          "offset": offset})
            continue
        parts = [_prose(rng, int(rng.integers(3, 9)))]
        r = rng.random()
        if r < 0.55:
            lat, lon = _random_point(rng)
            parts.append(f"at {lat:.5f}, {lon:.5f}")
        if rng.random() < 0.5:
            parts.append(f"on {_date_str(rng)}")
        if rng.random() < 0.25:
            name, a2, a3 = COUNTRIES[int(rng.integers(len(COUNTRIES)))]
            parts.append(f"in {name} ({a2}/{a3})")
        if rng.random() < 0.15:
            lat, lon = _random_point(rng)
            gh = geohash_encode(np.array([lat]), np.array([lon]), 8)[0]
            parts.append(f"geohash {gh}")
        if base_text and rng.random() < 0.3:
            lo = int(rng.integers(0, max(1, len(base_text) - 40)))
            parts.append(base_text[lo:lo + 40])
        text = " ".join(parts)
        spans.append({"kind": "text", "text": text, "media_ref": "",
                      "offset": offset})
        offset += len(text) + 1
    return spans


SPAN_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("offset", pa.int32()),
]))
CORPUS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_TYPE)])


def _rows_to_table(doc_ids, spans_lists) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([str(d) for d in doc_ids], pa.string()),
         pa.array(spans_lists, SPAN_TYPE)],
        schema=CORPUS_SCHEMA)


def interleave_documents(ds, seed: int = 42):
    """documents(doc_id, text, ...) Dataset → interleaved corpus Dataset.

    Streaming ``map_batches``; seeded per doc_id so any partitioning of the
    input yields the same corpus.
    """
    def to_corpus(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = (batch.column("text").to_pylist()
                 if "text" in batch.column_names else [""] * len(doc_ids))
        spans = [make_spans(d, _doc_rng(seed, d), t or "")
                 for d, t in zip(doc_ids, texts)]
        return _rows_to_table(doc_ids, spans)

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def synth_corpus(n_docs: int, seed: int = 42, parallelism: int = 8):
    """Standalone corpus of ``n_docs`` seeded documents as a Dataset."""
    import ray.data

    ds = ray.data.range(n_docs, override_num_blocks=parallelism)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        spans = [make_spans(i, _doc_rng(seed, i)) for i in ids]
        return _rows_to_table(ids, spans)

    return ds.map_batches(gen, batch_format="pyarrow")


def synth_corpus_table(n_docs: int, seed: int = 42) -> pa.Table:
    """Local (no-Ray) corpus table for unit tests."""
    ids = list(range(n_docs))
    spans = [make_spans(i, _doc_rng(seed, i)) for i in ids]
    return _rows_to_table(ids, spans)


# ---------------------------------------------------------------------------
# admin polygon fixture (FIXTURES.md F5)
# ---------------------------------------------------------------------------

def _make_admin_polygons(seed: int = 42) -> list[dict]:
    """~30 seeded convex/concave polygons: a jittered 6×5 tiling of
    lon ∈ [-30, 30], lat ∈ [-20, 20], plus an antimeridian straddler and a
    pole cap. Plain dicts — broadcast to join actors via ``ray.put``."""
    rng = np.random.default_rng(seed)
    polys = []
    k = 0
    for gx in range(6):
        for gy in range(5):
            lon0, lat0 = -30 + gx * 10.0, -20 + gy * 8.0
            jit = rng.uniform(-0.8, 0.8, 8)
            ring_lon = [lon0 + jit[0], lon0 + 10 + jit[1], lon0 + 10 + jit[2],
                        lon0 + jit[3]]
            ring_lat = [lat0 + jit[4], lat0 + jit[5], lat0 + 8 + jit[6],
                        lat0 + 8 + jit[7]]
            polys.append({"admin_id": f"A{k:03d}", "name": f"admin_{k}",
                          "ring_lat": ring_lat, "ring_lon": ring_lon})
            k += 1
    # antimeridian straddler, represented in the engine's convention as two
    # lon-normalized rings under one admin_id
    polys.append({"admin_id": "A900", "name": "antimeridian_east",
                  "ring_lat": [-5, -5, 5, 5], "ring_lon": [170, 180, 180, 170]})
    polys.append({"admin_id": "A900", "name": "antimeridian_west",
                  "ring_lat": [-5, -5, 5, 5], "ring_lon": [-180, -170, -170, -180]})
    # pole cap (all lat > 84)
    polys.append({"admin_id": "A901", "name": "pole_cap",
                  "ring_lat": [84, 84, 89.9, 89.9], "ring_lon": [-180, 180, 180, -180]})
    return polys


ADMIN_POLYGONS = _make_admin_polygons()
