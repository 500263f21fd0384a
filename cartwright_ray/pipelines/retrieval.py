"""End-to-end retrieval flagship — the engine's third cross-family
composite (VERDICT r04 Next #8): the production embedding-retrieval
chain as ONE streaming composition of already-oracled stages:

    chunk (overlapping token windows) → embed (deterministic synth)
    → sign-quantize → packed-Hamming shortlist → exact float rerank
    → dedup-by-cluster (best chunk per document per query)

Every stage is the already-verified module (stages/chunking,
stages/ann's sign_quantize/_HammingScan/_finalize_topk machinery), so
the composite's DuckDB oracle is the same rule chain in CTE form — any
drift in composition (chunk arithmetic, quantization sign convention,
shortlist scoping, rerank rounding, cluster-dedup order) fails the
value hash.

The *embedding* is a seeded deterministic function of the chunk's
identity and shape (doc_id, chunk_idx, token count, text length) —
the sandbox has no model, and a pure arithmetic embedding is what
makes the composite SQL-oracle-checkable end to end. Swapping in a
real encoder is a one-line change to ``embed_chunks``: the plumbing
(fixed-size-list column, actor-pool scan, broadcast queries) is the
real 100-TB shape.

Scale notes: chunking and embedding are shuffle-free map stages; the
corpus is pinned ONCE (``materialize``) because both retrieval passes
scan it; the Hamming shortlist collects only ``n_q × shortlist``
narrow rows to the driver (the documented small-side broadcast of
``rerank_ann_search``, stages/ann.py:509); the rerank pass streams
the corpus a second time against the broadcast shortlist; the final
dedup runs on the post-sort per-query segments. Nothing proportional
to the corpus ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.ann import (_finalize_topk, _normalize, _vecs_from_arrow,
                          hamming_ann_search)
from ..stages.chunking import chunk_tokens
from ..stages.partition import key_segments

#: chunk_id = doc_id * CHUNK_STRIDE + chunk_idx — recoverable on both
#: sides (doc_id = chunk_id // CHUNK_STRIDE), bounded by the assert in
#: embed_chunks.
CHUNK_STRIDE = 1024

_EMBED_MOD = 100_003          # base mixer modulus (prime)


def _embed_matrix(base: np.ndarray, dims: int) -> np.ndarray:
    """(n,) int64 base values → (n, dims) float64 synth embeddings in
    [-1, 0.999]: e[j] = ((base*(j+3) + j*j*7919) % 2000)/1000 - 1.
    Everything stays far below int64 overflow (base < 100003)."""
    j = np.arange(dims, dtype=np.int64)
    raw = (base[:, None] * (j + 3)[None, :] + (j * j * 7919)[None, :]) % 2000
    return raw.astype(np.float64) / 1000.0 - 1.0


def synth_query_vectors(query_ids, dims: int = 16) -> dict:
    """Deterministic query vectors from the same mixer family as
    :func:`embed_chunks` (base = (qid*40503 + 7) mod p) — no data read,
    no driver materialization."""
    qids = np.asarray(list(query_ids), dtype=np.int64)
    base = (qids * 40_503 + 7) % _EMBED_MOD
    return {"query_id": qids.tolist(), "vec": _embed_matrix(base, dims)}


def embed_chunks(ds, dims: int = 16):
    """Append (chunk_id:int64, embedding:fixed_size_list<double,dims>)
    to a :func:`chunk_tokens` output — one vectorized arithmetic kernel
    per batch, zero-copy in, no shuffle."""

    def embed(t: pa.Table) -> pa.Table:
        doc = np.asarray(t["doc_id"], dtype=np.int64)
        idx = np.asarray(t["chunk_idx"], dtype=np.int64)
        ntok = np.asarray(t["n_chunk_tokens"], dtype=np.int64)
        # Python len(str) and DuckDB length() both count CODEPOINTS, so
        # the oracle replays this exactly even off-ASCII
        import pyarrow.compute as pc
        tlen = np.asarray(pc.utf8_length(t["chunk_text"]), dtype=np.int64)
        if idx.size and int(idx.max()) >= CHUNK_STRIDE:
            raise ValueError("chunk_idx exceeds CHUNK_STRIDE id packing")
        base = (doc * 1_000_003 + idx * 7919 + ntok * 131 + tlen * 31) \
            % _EMBED_MOD
        emb = _embed_matrix(base, dims)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel(), pa.float64()), dims)
        t = t.append_column("chunk_id",
                            pa.array(doc * CHUNK_STRIDE + idx, pa.int64()))
        return t.append_column("embedding", arr)

    return ds.map_batches(embed, batch_format="pyarrow",
                          zero_copy_batch=True)


def dedup_by_doc(topk, m: int):
    """Cluster-dedup of a ``_finalize_topk`` result whose ids are packed
    chunk_ids: per (query, document) keep only the best-ranked chunk
    (chunks of one document are near-duplicate retrieval hits), then
    re-rank the survivors and keep the top ``m`` per query.

    The input is already sorted by query_id with per-query segments
    block-aligned (the finalize contract), so the kernel is a pure
    vectorized first-occurrence scan — no extra shuffle."""

    def kernel(t: pa.Table) -> pa.Table:
        q = np.asarray(t["query_id"])
        cid = np.asarray(t["chunk_id"], dtype=np.int64)
        rank = np.asarray(t["rank"], dtype=np.int64)
        doc = cid // CHUNK_STRIDE
        order = np.lexsort((rank, q))            # rank asc within query
        qs, ds_ = q[order], doc[order]
        # first occurrence of each (query, doc) pair in rank order
        pair = np.stack([qs, ds_], axis=1)
        _, first = np.unique(pair, axis=0, return_index=True)
        keep_sorted = np.zeros(len(order), dtype=bool)
        keep_sorted[first] = True
        kept = order[keep_sorted]            # already (query, rank)-sorted
        # re-rank survivors per query (inputs are rank-ordered per query)
        if kept.size == 0:
            out = t.slice(0, 0)
        else:
            starts, seg = key_segments(q[kept])
            new_rank = np.arange(len(kept), dtype=np.int64) - starts[seg]
            sel = new_rank < m
            out = t.take(pa.array(kept[sel]))
            out = out.set_column(
                out.column_names.index("rank"), "rank",
                pa.array(new_rank[sel], pa.int64()))
        return out.append_column(
            "doc_id", pa.array(np.asarray(out["chunk_id"],
                                          dtype=np.int64) // CHUNK_STRIDE,
                               pa.int64()))

    return topk.map_batches(kernel, batch_format="pyarrow",
                            batch_size=None)


def retrieval_pipeline(docs, query_ids=(0, 1, 2), dims: int = 16,
                       size: int = 32, stride: int = 24,
                       shortlist: int = 40, k: int = 20, m: int = 5,
                       round_decimals: int = 6, concurrency=None):
    """``docs`` needs (doc_id:int, text). Returns the deduped retrieval
    result: (query_id, chunk_id, doc_id, score, rank) — per query the
    top ``m`` documents' best chunks by exact cosine over the Hamming
    shortlist.

    Chain: chunk → embed → pin → Hamming shortlist (1 bit/dim packed
    XOR+popcount first pass) → broadcast-shortlist float rerank →
    finalize sort → per-(query, doc) cluster dedup."""
    import ray

    queries = synth_query_vectors(query_ids, dims)
    emb = embed_chunks(chunk_tokens(docs, size=size, stride=stride),
                       dims=dims).materialize()   # two retrieval scans

    short = hamming_ann_search(emb, queries, k=shortlist,
                               vec_col="embedding", id_col="chunk_id",
                               concurrency=concurrency).to_pandas()
    # the shortlist pass emits its ids under the fixed "vec_id" name
    per_q = {int(qid): np.sort(g["vec_id"].to_numpy())
             for qid, g in short.groupby("query_id")}
    qmat = _normalize(np.asarray(queries["vec"], dtype=np.float64))
    state_ref = ray.put((list(queries["query_id"]), qmat, per_q))

    def rerank(t: pa.Table) -> pa.Table:
        qids, qm, sl = ray.get(state_ref)
        vecs = _normalize(_vecs_from_arrow(t.column("embedding")))
        ids = np.asarray(t["chunk_id"], dtype=np.int64)
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(ids, sl.get(int(qid), ()))
            if not mask.any():
                continue
            sims = qm[qi] @ vecs[mask].T
            out_q.extend([qid] * int(mask.sum()))
            out_id.extend(ids[mask].tolist())
            out_s.extend(sims.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    # rerank is a stateless task fn: an int caps concurrent tasks, None
    # lets the streaming executor size it (tuple pools are actor-only)
    cands = emb.map_batches(rerank, batch_format="pyarrow",
                            concurrency=concurrency,
                            zero_copy_batch=True)
    topk = _finalize_topk(cands, k, round_decimals)
    # batch_size=None: 1:1 block mapping so the finalize sort's
    # per-query block alignment survives into the dedup kernel
    topk = topk.map_batches(
        lambda t: t.rename_columns(
            ["query_id", "chunk_id", "score", "rank"]),
        batch_format="pyarrow", batch_size=None)
    return dedup_by_doc(topk, m)
