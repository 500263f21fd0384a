"""Formula-derived deterministic inputs whose pipeline outputs are
reproducible in ANSI SQL — the oracle-construction layer (VERDICT r01
task 1).

Every builder derives its rows from a driver testdata table by integer
arithmetic only (plus float-exact .5/.25 offsets), so the DuckDB oracle
can rebuild the same input with a CTE and the driver's rows/schema/hash
check covers the full *real* pipeline (the same ``extract_points`` /
``encode_cells`` / ``pip_join`` / dedup stages users run — only the input
is synthetic). The seeded-RNG corpus (``sources.synth``) remains the
bench/entry input; these corpora exist so correctness is machine-checked
end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..sources.synth import CORPUS_SCHEMA, SPAN_TYPE

# (name, iso2, iso3) — subset of cartwright_ray.resources.COUNTRIES used by
# the derived corpus; index = doc_id % 8 (mirrored in the oracle SQL VALUES)
DERIVED_COUNTRIES = [
    ("France", "FR", "FRA"), ("Brazil", "BR", "BRA"),
    ("Japan", "JP", "JPN"), ("Kenya", "KE", "KEN"),
    ("Canada", "CA", "CAN"), ("Norway", "NO", "NOR"),
    ("Chile", "CL", "CHL"), ("Egypt", "EG", "EGY"),
]

_EPOCH_2020 = 1577836800  # epoch seconds of 2020-01-01T00:00:00Z



def _read_doc_ids(sf_dir: str):
    """documents.parquet doc_id column with blocks sized to the row count.

    Ray's default parallelism splits even a 500-row table into 64 blocks
    (one per 2×CPU), and per-task dispatch on the derived corpora then
    dominates every downstream stage (measured: 2.6s for a 48ms read).
    But too FEW blocks starves the compute-heavy downstreams (simhash
    signatures, point extraction inherit the block count — 3 blocks at
    sf0.1 meant 3-way parallelism and a 3x regression), so target ~150
    rows per block: task dispatch stays ~ms-scale while every core gets
    work from ~5k rows upward.
    """
    import pyarrow.parquet as pq
    import ray.data

    path = f"{sf_dir}/documents.parquet"
    rows = pq.ParquetFile(path).metadata.num_rows
    blocks = max(2, min(64, -(-rows // 150)))
    return ray.data.read_parquet(path, columns=["doc_id"],
                                 override_num_blocks=blocks)


def derived_latlon(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Primary point of doc d: float-exact .5-offset lat/lon formulas
    (same family as ``pipelines.relational.derived_points``)."""
    lat = (doc_id * 7919 % 170).astype(np.float64) - 85.0 + 0.5
    lon = (doc_id * 104729 % 360).astype(np.float64) - 180.0 + 0.5
    return lat, lon


def derived_latlon2(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Secondary point (docs with d % 3 == 0): .25-offset formulas."""
    lat = (doc_id * 7433 % 170).astype(np.float64) - 85.0 + 0.25
    lon = (doc_id * 15161 % 360).astype(np.float64) - 180.0 + 0.25
    return lat, lon


def derived_corpus(sf_dir: str):
    """documents.parquet (doc_id BIGINT) → interleaved corpus Dataset with
    a FIXED 3-span layout per doc, every extractable a pure function of
    doc_id:

    - span 0 (text): "obs {lat1:.4f}, {lon1:.4f} on {date} in {country}
      ({A2}/{A3})" — lat1/lon1 from :func:`derived_latlon`; date =
      2020-01-01 + (d*13 % 1000) days (%Y-%m-%d); country =
      DERIVED_COUNTRIES[d % 8].
    - span 1: media span (ref "media://{d}/1") when d % 5 == 0, else a
      plain text span with no extractables.
    - span 2 (text): "next {lat2:.4f}, {lon2:.4f}" when d % 3 == 0, else
      plain text.

    Extraction therefore yields row (d, 0) for every doc and (d, 2) for
    d % 3 == 0 — exactly what the oracle SQL reconstructs.
    """
    import datetime

    import ray.data

    ds = _read_doc_ids(sf_dir)
    base = datetime.date(2020, 1, 1)

    def build(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        lat1, lon1 = derived_latlon(d)
        lat2, lon2 = derived_latlon2(d)
        day = (d * 13 % 1000).astype(np.int64)
        doc_ids, spans = [], []
        for i in range(len(d)):
            di = int(d[i])
            name, a2, a3 = DERIVED_COUNTRIES[di % 8]
            date = (base + datetime.timedelta(days=int(day[i]))).isoformat()
            t0 = (f"obs {lat1[i]:.4f}, {lon1[i]:.4f} on {date} "
                  f"in {name} ({a2}/{a3})")
            if di % 5 == 0:
                s1 = {"kind": "media", "text": "",
                      "media_ref": f"media://{di}/1", "offset": len(t0) + 1}
            else:
                s1 = {"kind": "text", "text": "plain note body",
                      "media_ref": "", "offset": len(t0) + 1}
            if di % 3 == 0:
                t2 = f"next {lat2[i]:.4f}, {lon2[i]:.4f}"
            else:
                t2 = "tail note body"
            spans.append([
                {"kind": "text", "text": t0, "media_ref": "", "offset": 0},
                s1,
                {"kind": "text", "text": t2, "media_ref": "",
                 "offset": s1["offset"] + len(s1["text"]) + 1},
            ])
            doc_ids.append(str(di))
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.string()), pa.array(spans, SPAN_TYPE)],
            schema=CORPUS_SCHEMA)

    return ds.map_batches(build, batch_format="pyarrow")


def derived_corpus_extracted(sf_dir: str):
    """Real extraction stage over the derived corpus."""
    from ..stages.extract import extract_points
    return extract_points(derived_corpus(sf_dir))


def derived_corpus_encoded(sf_dir: str):
    """Real encode stage over the derived extraction."""
    from ..stages.encode import encode_cells
    return encode_cells(derived_corpus_extracted(sf_dir))


# ---------------------------------------------------------------------------
# planted-clone document corpora (dedup / fingerprint oracles)
# ---------------------------------------------------------------------------

def _derived_text(doc_id: int, n_tokens: int = 30) -> str:
    """Deterministic high-entropy text: hex tokens keyed on (doc_id, i).
    Distinct docs share almost no char-4-gram shingles (hex 4-gram space
    is 65k; ~400 shingles/doc → expected pairwise jaccard < 0.01), so the
    ONLY near/exact-dup pairs in a planted corpus are the planted clones.
    """
    toks = [hashlib.blake2b(f"{doc_id}:{i}".encode(),
                            digest_size=6).hexdigest()
            for i in range(n_tokens)]
    return " ".join(toks)


def planted_clone_docs(sf_dir: str, clones: int = 25, offset: int = 100000):
    """(doc_id int64, text) Dataset: one deterministic text per documents
    row, plus an EXACT clone (id + offset) for doc_id < ``clones``.

    Expected dedup answer (mirrored by the oracle SQL from id arithmetic
    alone): every clone id pairs with its original; nothing else pairs.
    """
    import ray.data

    ds = _read_doc_ids(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        ids, texts = [], []
        for di in d:
            di = int(di)
            t = _derived_text(di)
            ids.append(di)
            texts.append(t)
            if di < clones:
                ids.append(di + offset)
                texts.append(t)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(build, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language-derived corpus (langid oracle)
# ---------------------------------------------------------------------------

# phrases built ONLY from tokens unique to one language's stopword table
# (cartwright_ray.stages.textstats._STOPWORDS) plus non-stopword fillers,
# so LangId classifies each deterministically; index = doc_id % 4
DERIVED_LANG_PHRASES = [
    ("en", "the cat and the dog that have this to go of it was fine"),
    ("fr", "le chien et le chat dans une rue pour qui avec ce pas du au sur"),
    ("es", "el perro y los gatos del mundo por con para se su al lo una"),
    ("de", "der hund und die katze ist von den im ein eine mit auf zu"),
]


def derived_typed_table(sf_dir: str):
    """A table whose columns exercise the classification cascade with
    formula-derived values (classify output becomes a golden constant and
    the date column's temporal resolution is SQL-computable):

    - lat_str / lon_str: "%.4f" of :func:`derived_latlon` (latitude /
      longitude detectors)
    - date_str: 2020-01-01 + (d*13 % 1000) days, %Y-%m-%d (date detector)
    - iso3 / cname: DERIVED_COUNTRIES[d % 8] (ISO3 / country_name)
    - val: plain double (classified as nothing)
    """
    import datetime

    import ray.data

    ds = _read_doc_ids(sf_dir)
    base = datetime.date(2020, 1, 1)

    def build(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        lat, lon = derived_latlon(d)
        day = (d * 13 % 1000).astype(np.int64)
        dates = [(base + datetime.timedelta(days=int(k))).isoformat()
                 for k in day]
        names = [DERIVED_COUNTRIES[int(di) % 8] for di in d]
        return pa.table({
            "lat_str": pa.array([f"{v:.4f}" for v in lat], pa.string()),
            "lon_str": pa.array([f"{v:.4f}" for v in lon], pa.string()),
            "date_str": pa.array(dates, pa.string()),
            "iso3": pa.array([n[2] for n in names], pa.string()),
            "cname": pa.array([n[0] for n in names], pa.string()),
            "val": pa.array((d % 97).astype(np.float64) * 0.5),
        })

    return ds.map_batches(build, batch_format="pyarrow")


def lang_derived_docs(sf_dir: str):
    """(doc_id, text) Dataset where text is the stopword phrase of language
    DERIVED_LANG_PHRASES[doc_id % 4] — LangId output becomes a pure
    function of doc_id (oracle: CASE doc_id % 4)."""
    import ray.data

    ds = _read_doc_ids(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        texts = [DERIVED_LANG_PHRASES[int(di) % 4][1] for di in d]
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(build, batch_format="pyarrow")


def planted_cluster_docs(sf_dir: str, chains: int = 25,
                         offset: int = 100000):
    """(doc_id int64, text) Dataset: one deterministic text per documents
    row, plus TWO exact clones (id + offset, id + 2*offset) for
    doc_id < ``chains`` — a planted 3-node component per original.

    Expected clustering answer (mirrored by the oracle SQL from id
    arithmetic alone): each triple {i, i+offset, i+2*offset} is one
    connected component with cluster_id = i; every other doc is a
    singleton (high-entropy derived texts share <1% jaccard) and is NOT
    emitted. Exact clones ⇒ minhash estimate is exactly 1.0, so the edge
    set is deterministic regardless of estimate noise."""
    import ray.data

    ds = _read_doc_ids(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        ids, texts = [], []
        for di in d:
            di = int(di)
            t = _derived_text(di)
            ids.append(di)
            texts.append(t)
            if di < chains:
                ids.extend([di + offset, di + 2 * offset])
                texts.extend([t, t])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(build, batch_format="pyarrow")


def planted_near_clone_docs(sf_dir: str, clones: int = 25,
                            offset: int = 100000):
    """planted_clone_docs variant for EXACT-jaccard dedup oracles: the
    clone's last token is replaced, so each planted pair's char-4-gram
    jaccard is ~0.93 (far above a 0.8 threshold) while unrelated docs
    stay below 0.01 — the planted answer is the only answer."""
    import ray.data

    ds = _read_doc_ids(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        ids, texts = [], []
        for di in d:
            di = int(di)
            t = _derived_text(di)
            ids.append(di)
            texts.append(t)
            if di < clones:
                alt = hashlib.blake2b(f"{di}:alt".encode(),
                                      digest_size=6).hexdigest()
                ids.append(di + offset)
                texts.append(t.rsplit(" ", 1)[0] + " " + alt)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(build, batch_format="pyarrow")
