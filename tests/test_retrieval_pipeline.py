"""Retrieval composite (pipelines/retrieval.py): brute-force oracle in
plain numpy for the FULL chain (chunk → embed → Hamming shortlist →
cosine rerank → doc-cluster dedup), plus edge cases the SQL oracle's
synthetic corpus cannot hit."""

import re

import numpy as np
import pandas as pd
import pytest

from cartwright_ray.pipelines.retrieval import (CHUNK_STRIDE, _EMBED_MOD,
                                                _embed_matrix, dedup_by_doc,
                                                retrieval_pipeline,
                                                synth_query_vectors)


def _brute(docs: dict[int, str], query_ids, dims=16, size=32, stride=24,
           shortlist=40, k=20, m=5):
    """Pure-python replay of the whole composite."""
    rows = []          # (chunk_id, vec)
    for doc_id, text in docs.items():
        toks = [t for t in re.split(r"\s+", text) if t]
        n = len(toks)
        if n == 0:
            continue
        kk = 1 + (max(n - size, 0) + stride - 1) // stride
        for i in range(kk):
            lens = min(size, n - i * stride)
            chunk = " ".join(toks[i * stride:i * stride + size])
            base = (doc_id * 1_000_003 + i * 7919 + lens * 131
                    + len(chunk) * 31) % _EMBED_MOD
            vec = _embed_matrix(np.array([base], dtype=np.int64), dims)[0]
            rows.append((doc_id * CHUNK_STRIDE + i, vec))
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.stack([r[1] for r in rows])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    q = synth_query_vectors(query_ids, dims)
    Q = np.asarray(q["vec"])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    out = []
    for qi, qid in enumerate(q["query_id"]):
        ham = ((V >= 0) != (Q[qi] >= 0)[None, :]).sum(axis=1)
        short = ids[np.lexsort((ids, ham))[:shortlist]]
        mask = np.isin(ids, short)
        sims = np.round(Vn[mask] @ Qn[qi], 6)
        sid = ids[mask]
        order = np.lexsort((sid, -sims))[:k]
        seen, rank = set(), 0
        for o in order:
            doc = int(sid[o]) // CHUNK_STRIDE
            if doc in seen:
                continue
            seen.add(doc)
            if rank < m:
                out.append((int(qid), int(sid[o]), doc,
                            float(sims[o]), rank))
            rank += 1
    return pd.DataFrame(out, columns=["query_id", "chunk_id", "doc_id",
                                      "score", "rank"])


def _mkdocs(ray, docs: dict[int, str]):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs.keys()), "text": list(docs.values())}))


def test_retrieval_matches_brute_force(ray_session):
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    docs = {i: " ".join(rng.choice(words, size=int(rng.integers(1, 90))))
            for i in range(40)}
    docs[40] = ""                      # empty doc emits no chunks
    docs[41] = "   "                   # whitespace-only likewise
    got = retrieval_pipeline(_mkdocs(ray_session, docs),
                             query_ids=(0, 1, 2)).to_pandas()
    got = got[["query_id", "chunk_id", "doc_id", "score", "rank"]] \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = _brute(docs, (0, 1, 2)) \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_retrieval_small_corpus_fewer_than_m(ray_session):
    docs = {7: "one two three four five"}
    got = retrieval_pipeline(_mkdocs(ray_session, docs),
                             query_ids=(0,), m=5).to_pandas()
    # one doc → exactly one surviving chunk per query
    assert len(got) == 1
    assert got["doc_id"].tolist() == [7]
    assert got["rank"].tolist() == [0]


def test_dedup_by_doc_keeps_best_chunk_per_doc(ray_session):
    import pyarrow as pa
    import ray.data
    t = pa.table({
        "query_id": pa.array([0] * 6, pa.int64()),
        "chunk_id": pa.array([1 * CHUNK_STRIDE + 2, 1 * CHUNK_STRIDE + 0,
                              2 * CHUNK_STRIDE + 1, 2 * CHUNK_STRIDE + 3,
                              3 * CHUNK_STRIDE + 0, 4 * CHUNK_STRIDE + 9],
                             pa.int64()),
        "score": pa.array([.9, .8, .7, .6, .5, .4], pa.float64()),
        "rank": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    })
    out = dedup_by_doc(ray.data.from_arrow(t), m=3).to_pandas()
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["chunk_id"].tolist() == [1 * CHUNK_STRIDE + 2,
                                        2 * CHUNK_STRIDE + 1,
                                        3 * CHUNK_STRIDE + 0]
    assert out["rank"].tolist() == [0, 1, 2]


def test_chunk_idx_overflow_guard(ray_session):
    # a doc long enough to exceed CHUNK_STRIDE chunks must fail loudly,
    # not silently collide chunk_ids
    long_doc = " ".join(["w"] * (32 + 24 * (CHUNK_STRIDE + 1)))
    with pytest.raises(Exception, match="CHUNK_STRIDE"):
        retrieval_pipeline(_mkdocs(ray_session, {0: long_doc}),
                           query_ids=(0,)).to_pandas()


def test_retrieval_many_queries_matches_brute_force(ray_session):
    """64 queries over a multi-block corpus: stresses the finalize
    sort's per-query block alignment that dedup_by_doc relies on (a
    query split across blocks would produce duplicate docs / wrong
    ranks)."""
    rng = np.random.default_rng(7)
    words = ["w%d" % i for i in range(30)]
    docs = {i: " ".join(rng.choice(words, size=int(rng.integers(5, 120))))
            for i in range(120)}
    qids = tuple(range(64))
    got = retrieval_pipeline(_mkdocs(ray_session, docs), query_ids=qids,
                             shortlist=20, k=10, m=3).to_pandas()
    got = got[["query_id", "chunk_id", "doc_id", "score", "rank"]] \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = _brute(docs, qids, shortlist=20, k=10, m=3) \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
