"""Deduplication operators over a document corpus (engine-only; no
reference equivalent — required first-class components for a
training-data pipeline at 100 TB).

All variants follow the same scale shape:

1. a **vectorized per-batch signature stage** (``map_batches``, numpy —
   shingles are packed into integers, minhash/simhash are matrix ops with
   ``np.minimum.reduceat`` / bit-count reductions, never a Python loop per
   shingle);
2. a **hash-partition shuffle on the signature key** (``groupby``) so each
   group is small;
3. a **per-group verify/select** (``map_groups``) that emits survivors or
   duplicate pairs.

Duplicate-pair semantics: a doc is a *duplicate* if some similar doc with a
smaller ``id_col`` value exists (deterministic canonical survivor — no
union-find chase across groups; documented approximation standard for
LSH-style dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# shared: shingling packed into uint64 (a char 4-gram is its own hash)
# ---------------------------------------------------------------------------


def _shingle_hashes(texts: list[str], k: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated char-k-gram codes for a batch + per-doc counts.

    Each doc's lowercased utf-8 bytes are windowed into k-byte integers
    with a single vectorized sliding-window view — no per-shingle Python.
    """
    counts = np.empty(len(texts), dtype=np.int64)
    parts = []
    for i, t in enumerate(texts):
        b = np.frombuffer(str(t).lower().encode("utf-8", "replace"), dtype=np.uint8)
        if b.size < k:
            b = np.pad(b, (0, k - b.size))
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        code = np.zeros(win.shape[0], dtype=np.uint64)
        for j in range(k):
            code = (code << np.uint64(8)) | win[:, j]
        code = np.unique(code)
        parts.append(code)
        counts[i] = code.size
    return (np.concatenate(parts) if parts else np.empty(0, np.uint64)), counts


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_sig(shingles: np.ndarray, counts: np.ndarray,
                 num_perm: int, seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) minhash signatures, fully vectorized:
    h_i(x) = (a_i * x + b_i) mod (2^61-1), per-doc min via reduceat."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), num_perm, dtype=np.uint64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sigs = np.empty((len(counts), num_perm), dtype=np.uint64)
    x = shingles
    for i in range(num_perm):
        hx = (a[i] * x + b[i]) & _MERSENNE   # mod 2^64 then mask ~ good mixing
        if x.size:
            mins = np.minimum.reduceat(hx, starts)
        else:
            mins = np.empty(0, np.uint64)
        mins = np.where(counts > 0, mins, np.uint64(0))
        sigs[:, i] = mins
    return sigs


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Exact duplicate removal: hash-partition by a content hash of
    ``col``, keep the min-``id_col`` row per group (SURVEY.md §2.7 T7
    generalized). Survivors keep all original columns."""
    import hashlib

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.blake2b(str(v).encode("utf-8", "replace"),
                              digest_size=8).hexdigest()
              for v in batch.column(col).to_pylist()]
        return batch.append_column("content_hash", pa.array(hs, pa.string()))

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("content_hash")
              .map_groups(first_per_group, batch_format="pandas")
              .drop_columns(["content_hash"]))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


_SHINGLE_MEMO: dict = {}


def _shingle_set(text: str, k: int = 4) -> set:
    """Worker-global memo: in LSH verify the same doc appears in up to
    ``bands`` buckets — recomputing its shingle set each time dominates the
    verify stage."""
    import hashlib
    key = (hashlib.blake2b(text.encode("utf-8", "replace"),
                           digest_size=8).digest(), k)
    got = _SHINGLE_MEMO.get(key)
    if got is None:
        if len(_SHINGLE_MEMO) > 50_000:   # bound worker memory
            _SHINGLE_MEMO.clear()
        h, _ = _shingle_hashes([text], k)
        got = _SHINGLE_MEMO.setdefault(key, frozenset(h.tolist()))
    return got


def minhash_lsh_dedup(ds, col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.8, shingle_k: int = 4,
                      seed: int = 7):
    """MinHash+LSH near-dup detection.

    shingle → minhash (vectorized) → band → bucket ``groupby`` → exact
    jaccard verify within buckets. Returns a Dataset of duplicate pairs
    ``(dup_id, kept_id, jac)`` with dup_id > kept_id.

    Scale note: band rows carry the document text so the in-bucket verify
    can compute *exact* jaccard — a bands× duplication of text through the
    shuffle. At corpus scale, swap the verify to signature-estimated
    jaccard (carry the 64×u64 signature instead of text; standard MinHash
    practice, ±1/√perms estimate error) — the pipeline shape is unchanged.
    """
    rows = num_perm // bands

    def signatures(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        sigs = _minhash_sig(*_shingle_hashes(texts, shingle_k), num_perm, seed)
        # one output row per (doc, band)
        band_keys, out_ids, out_texts = [], [], []
        for bi in range(bands):
            band = sigs[:, bi * rows:(bi + 1) * rows]
            # band hash: fold the band's values; prefix with band index so
            # buckets never collide across bands
            bh = np.zeros(len(ids), dtype=np.uint64)
            for c in range(rows):
                bh = bh * np.uint64(1099511628211) + band[:, c]
            band_keys.extend([f"{bi}:{int(v)}" for v in bh])
            out_ids.extend(ids)
            out_texts.extend(texts)
        return pa.table({"band_key": pa.array(band_keys, pa.string()),
                         id_col: pa.array(out_ids),
                         col: pa.array(out_texts, pa.string())})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"dup_id": [], "kept_id": [], "jac": []})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].tolist()
        sets = [_shingle_set(t, shingle_k) for t in g[col]]
        dup, kept, jacs = [], [], []
        for i in range(1, len(ids)):
            for j in range(i):
                jc = jaccard(sets[i], sets[j])
                if jc >= threshold:
                    dup.append(ids[i]); kept.append(ids[j]); jacs.append(jc)
                    break
        return pd.DataFrame({"dup_id": dup, "kept_id": kept, "jac": jacs})

    pairs = (ds.map_batches(signatures, batch_format="pyarrow")
               .groupby("band_key")
               .map_groups(verify, batch_format="pandas"))

    # a doc may surface in several bands → keep one (min kept_id) pair
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("kept_id").head(1)

    return pairs.groupby("dup_id").map_groups(dedup_pairs,
                                              batch_format="pandas")


def brute_force_near_dups(texts, ids, threshold=0.8, shingle_k=4):
    """Oracle: all-pairs jaccard; (dup_id, any kept_id) map for dup docs."""
    sets = [_shingle_set(t, shingle_k) for t in texts]
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
    dups = {}
    for oi in range(1, len(order)):
        i = order[oi]
        for oj in range(oi):
            j = order[oj]
            if jaccard(sets[i], sets[j]) >= threshold:
                dups[ids[i]] = ids[j]
                break
    return dups


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------

def simhash_signatures(texts: list[str], shingle_k: int = 4,
                       seed: int = 11) -> np.ndarray:
    """64-bit simhash per doc, vectorized (bit-expand + reduceat sums)."""
    shingles, counts = _shingle_hashes(texts, shingle_k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), 1, dtype=np.uint64)[0]
    h = (shingles * a) & np.uint64(0xFFFFFFFFFFFFFFFF)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32)  # (m, 64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    if bits.shape[0]:
        sums = np.add.reduceat(bits, starts, axis=0)
    else:
        sums = np.zeros((len(counts), 64), dtype=np.int32)
    sums = np.where(counts[:, None] > 0, sums, 0)
    sign = (sums * 2 > counts[:, None]).astype(np.uint64)
    sig = np.zeros(len(counts), dtype=np.uint64)
    for b in range(64):
        sig |= sign[:, b] << np.uint64(b)
    return sig


def simhash_dedup(ds, col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, shingle_k: int = 4, seed: int = 11):
    """SimHash near-dup: 4×16-bit band buckets (any doc pair within
    hamming ≤ 3 of 64 bits shares ≥1 exact 16-bit band), verify hamming in
    group. Emits (dup_id, kept_id, hamming) pairs."""

    def signatures(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        sig = simhash_signatures(texts, shingle_k, seed)
        keys, out_ids, out_sigs = [], [], []
        for b in range(4):
            band = (sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            keys.extend([f"{b}:{int(v)}" for v in band])
            out_ids.extend(ids)
            out_sigs.extend(sig.tolist())
        return pa.table({"band_key": pa.array(keys, pa.string()),
                         id_col: pa.array(out_ids),
                         "simhash": pa.array(out_sigs, pa.uint64())})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"dup_id": [], "kept_id": [], "hamming": []})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].tolist()
        sigs = g["simhash"].to_numpy(dtype=np.uint64)
        dup, kept, ham = [], [], []
        for i in range(1, len(ids)):
            x = sigs[:i] ^ sigs[i]
            counts = np.array([bin(int(v)).count("1") for v in x])
            hits = np.nonzero(counts <= max_hamming)[0]
            if hits.size:
                j = hits[0]
                dup.append(ids[i]); kept.append(ids[j]); ham.append(int(counts[j]))
        return pd.DataFrame({"dup_id": dup, "kept_id": kept, "hamming": ham})

    pairs = (ds.map_batches(signatures, batch_format="pyarrow")
               .groupby("band_key")
               .map_groups(verify, batch_format="pandas"))

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("kept_id").head(1)

    return pairs.groupby("dup_id").map_groups(dedup_pairs,
                                              batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(ds, vec_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.95,
                        num_planes: int = 16, seed: int = 13):
    """Near-dup by embedding cosine: LSH-bucket on random-hyperplane sign
    signature (``groupby``), verify exact cosine within buckets. Emits
    (dup_id, kept_id, cos) pairs. Pairs split across buckets with no shared
    signature are missed — the standard LSH trade-off; raise ``num_planes``
    bands for higher recall."""

    def signatures(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        ids = batch.column(id_col).to_pylist()
        rng = np.random.default_rng(seed)
        planes = rng.normal(size=(vecs.shape[1], num_planes))
        signs = (vecs @ planes) >= 0
        keys = ["".join("1" if s else "0" for s in row) for row in signs]
        # two bands of half the planes each → better recall near threshold
        half = num_planes // 2
        out = {"band_key": [], id_col: [], "vec": []}
        for row_key, i, v in zip(keys, ids, vecs):
            out["band_key"].append("a:" + row_key[:half])
            out[id_col].append(i)
            out["vec"].append(v.tolist())
            out["band_key"].append("b:" + row_key[half:])
            out[id_col].append(i)
            out["vec"].append(v.tolist())
        return pa.table({"band_key": pa.array(out["band_key"], pa.string()),
                         id_col: pa.array(out[id_col]),
                         "vec": pa.array(out["vec"], pa.list_(pa.float64()))})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"dup_id": [], "kept_id": [], "cos": []})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].tolist()
        v = np.asarray(g["vec"].tolist(), dtype=np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = v @ v.T
        dup, kept, cos = [], [], []
        for i in range(1, len(ids)):
            hits = np.nonzero(sims[i, :i] >= threshold)[0]
            if hits.size:
                j = hits[0]
                dup.append(ids[i]); kept.append(ids[j]); cos.append(float(sims[i, j]))
        return pd.DataFrame({"dup_id": dup, "kept_id": kept, "cos": cos})

    pairs = (ds.map_batches(signatures, batch_format="pyarrow")
               .groupby("band_key")
               .map_groups(verify, batch_format="pandas"))

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("kept_id").head(1)

    return pairs.groupby("dup_id").map_groups(dedup_pairs,
                                              batch_format="pandas")
