"""Similarity search over an embedding column (engine-only first-class
component): brute-force cosine top-k as the exact baseline, LSH-bucketed
variant as the scale path.

Brute force: the query matrix is broadcast once (``ray.put``); each batch
does one float64 matmul against it and emits per-batch local top-k
candidates (k per query per batch — tiny); a final small sort/limit per
query selects the global top-k. The full similarity matrix never exists.

Candidate pruning ranks by the score ROUNDED to ``round_decimals`` with an
id tiebreak — the same order the final ranking (and the DuckDB oracle)
uses, so a candidate tied after rounding can never be pruned by a raw-score
near-tie (ADVICE r01).
"""

from __future__ import annotations

from ..util import _pool

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _vecs_from_arrow(col) -> np.ndarray:
    """(n, d) float64 view of a list<float>/fixed_size_list<float> column —
    zero-copy flatten + reshape, no ``to_pylist`` (VERDICT r01 fix 8)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_fixed_size_list(col.type) or pa.types.is_list(col.type)
            or pa.types.is_large_list(col.type)):
        # e.g. Ray's ArrowTensorArray extension type (pandas-roundtripped
        # list columns): its to_numpy already yields the (n, d) tensor
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype == object:
            return np.stack(arr).astype(np.float64)
        return np.asarray(arr, dtype=np.float64).reshape(len(col), -1)
    if pa.types.is_fixed_size_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), col.type.list_size).astype(np.float64)
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.empty((0, 0), dtype=np.float64)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("embedding column is ragged; expected fixed width")
    # ListArray.flatten() already honors any slice offset (it re-slices
    # the values child), so the result is exactly len(col)*d floats —
    # re-applying offsets[0] here double-shifted sliced arrays (ADVICE r02)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), d).astype(np.float64)


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def _topk_rounded(sims_row: np.ndarray, ids: np.ndarray, k: int,
                  round_decimals: int | None) -> np.ndarray:
    """Indices of the top-k by (rounded score desc, id asc) — the final
    ranking's exact order, applied at the pruning step."""
    r = np.round(sims_row, round_decimals) if round_decimals is not None \
        else sims_row
    order = np.lexsort((ids, -r))
    return order[:k]


def _finalize_topk(cands, k: int, round_decimals: int | None):
    """Global top-k per query over the per-batch candidate rows — ONE
    sort exchange keyed on query_id followed by a whole-block segment
    kernel (key_segments + lexsort), replacing the per-query pandas
    ``map_groups`` dispatch all four ANN variants shared (VERDICT r03
    Next #3). Sorts by EXACTLY the segment key so a query's rows can
    never split across block boundaries; the (score, id) order happens
    inside the kernel. Returns (query_id, vec_id, score, rank)."""
    from .partition import key_segments

    def kernel(t: pa.Table) -> pa.Table:
        q = np.asarray(t["query_id"])
        s = np.asarray(t["score"], dtype=np.float64)
        if round_decimals is not None:
            s = np.round(s, round_decimals)
        vid = np.asarray(t["vec_id"])
        order = np.lexsort((vid, -s, q))
        starts, seg = key_segments(q[order])
        rank = np.arange(len(order), dtype=np.int64) - starts[seg]
        keep = rank < k
        out = t.take(pa.array(order[keep]))
        out = out.set_column(out.column_names.index("score"), "score",
                             pa.array(s[order][keep], pa.float64()))
        return out.append_column("rank", pa.array(rank[keep], pa.int64()))

    return cands.sort("query_id").map_batches(kernel, batch_format="pyarrow",
                                              batch_size=None)


class _ScanActor:
    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str,
                 round_decimals):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qids = list(q["query_id"])
        self.qmat = _normalize(np.asarray(q["vec"], dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.round_decimals = round_decimals

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_vecs_from_arrow(batch.column(self.vec_col)))
        ids = np.asarray(batch.column(self.id_col))
        sims = self.qmat @ vecs.T                       # (n_q, n_batch)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            cand = _topk_rounded(sims[qi], ids, k, self.round_decimals)
            out_q.extend([qid] * len(cand))
            out_id.extend(ids[cand].tolist())
            out_s.extend(sims[qi, cand].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "vec_id": pa.array(out_id),
                         "score": pa.array(out_s, pa.float64())})


def ann_search(ds, queries: dict, k: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id", concurrency: int | None = None,
               batch_size: int = 4096, round_decimals: int | None = 6):
    """Exact cosine top-k: per-batch matmul candidates → global top-k via a
    small per-query ``map_groups``. ``queries`` = {query_id: [...], vec:
    (n_q, d) array-like}. Returns (query_id, vec_id, rank, score).

    ``round_decimals`` rounds scores *before* ranking (both at the pruning
    step and globally) so results are bit-stable against summation-order
    differences and match the DuckDB oracle, which ranks by the same
    rounded score."""
    import ray
    queries_ref = ray.put(queries)
    cands = ds.map_batches(
        _ScanActor,
        fn_constructor_args=(queries_ref, k, vec_col, id_col, round_decimals),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(concurrency), zero_copy_batch=True)

    return _finalize_topk(cands, k, round_decimals)


def lsh_ann_search(ds, queries: dict, k: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", num_planes: int = 6,
                   max_hamming: int = 2, seed: int = 17,
                   concurrency: int = 4, round_decimals: int | None = 6):
    """Approximate variant (scale path): random-hyperplane signature
    pre-filter — only vectors whose signature is within ``max_hamming`` of
    the query's signature are scored (multi-probe). Same output schema;
    recall measured in tests, not guaranteed: with the defaults ~1/3 of the
    data is scanned, which on clustered real-world embeddings gives high
    recall; on *uniform random* vectors (weak neighbor correlation) recall
    degrades toward the scan fraction — that is inherent to sign-LSH, not a
    bug."""
    import ray

    rng = np.random.default_rng(seed)
    qmat = _normalize(np.asarray(queries["vec"], dtype=np.float64))
    planes = rng.normal(size=(qmat.shape[1], num_planes))
    qsig = ((qmat @ planes) >= 0).astype(np.uint32)
    qbits = np.zeros(len(qsig), dtype=np.uint32)
    for b in range(num_planes):
        qbits |= qsig[:, b] << b
    bundle = {"query_id": list(queries["query_id"]), "vec": qmat,
              "qbits": qbits, "planes": planes, "num_planes": num_planes}
    bundle_ref = ray.put(bundle)

    class _LSHScan:
        def __init__(self):
            b = ray.get(bundle_ref)
            self.qids = b["query_id"]
            self.qmat = b["vec"]
            self.qbits = b["qbits"]
            self.planes = b["planes"]
            self.np_ = b["num_planes"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_vecs_from_arrow(batch.column(vec_col)))
            ids = np.asarray(batch.column(id_col))
            s = (vecs @ self.planes) >= 0
            vbits = np.zeros(len(vecs), dtype=np.uint32)
            for b in range(self.np_):
                vbits |= s[:, b].astype(np.uint32) << b
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                x = (vbits ^ self.qbits[qi]).astype(np.uint32)
                ham = _POP8[x.view(np.uint8).reshape(-1, 4)].sum(axis=1)
                cand = np.nonzero(ham <= max_hamming)[0]
                if cand.size == 0:
                    continue
                sims = vecs[cand] @ self.qmat[qi]
                kk = min(k, cand.size)
                top = _topk_rounded(sims, ids[cand], kk, round_decimals)
                out_q.extend([qid] * kk)
                out_id.extend(ids[cand[top]].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table({"query_id": pa.array(out_q),
                             "vec_id": pa.array(out_id),
                             "score": pa.array(out_s, pa.float64())})

    cands = ds.map_batches(_LSHScan, batch_format="pyarrow",
                           batch_size=4096, concurrency=_pool(concurrency))

    return _finalize_topk(cands, k, round_decimals)


def ivf_centroids(dim: int, nlist: int, seed: int = 29) -> np.ndarray:
    """Deterministic coarse-quantizer centroids: seeded unit vectors.

    A trained k-means quantizer fits real data tighter, but a FIXED seeded
    quantizer keeps assignment a pure function of the vector — the
    property the oracle (and resumable re-runs) need. Swap in trained
    centroids without touching the plumbing."""
    rng = np.random.default_rng(seed)
    return _normalize(rng.normal(size=(nlist, dim)))


def ivf_assign(vecs: np.ndarray, centroids: np.ndarray,
               round_decimals: int = 9) -> np.ndarray:
    """Nearest-centroid id per (already normalized) vector — argmax of the
    ROUNDED cosine with centroid-id tiebreak, the same order a SQL
    ``row_number() OVER (ORDER BY round(sim, 9) DESC, cid)`` produces."""
    sims = np.round(vecs @ centroids.T, round_decimals)    # (n, nlist)
    # lexsort-free argmax with id tiebreak: argmax takes the FIRST max,
    # which is the lowest centroid id
    return np.argmax(sims, axis=1).astype(np.int64)


def ivf_partition_write(ds, path: str, vec_col: str = "embedding",
                        nlist: int = 16, seed: int = 29) -> None:
    """Materialize the corpus as Parquet partitioned by IVF list id —
    the layout that turns :func:`ivf_ann_search`'s probe filter into a
    READER-level partition prune (the 100-TB claim in its docstring,
    VERDICT r02 Next #7): each vector row lands under
    ``path/ivf_list=<cid>/``, so a search that probes ``nprobe`` of
    ``nlist`` lists opens exactly that fraction of the files and the
    rest never leave storage.

    Assignment is the same pure function of the vector as the streaming
    path (seeded centroids, rounded-cosine argmax), so a corpus written
    once serves any later query set."""

    def assign_batch(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_vecs_from_arrow(batch.column(vec_col)))
        cents = ivf_centroids(vecs.shape[1] if vecs.size else 1, nlist, seed)
        cid = ivf_assign(vecs, cents) if vecs.size \
            else np.empty(0, np.int64)
        return batch.append_column("ivf_list", pa.array(cid, pa.int64()))

    ds.map_batches(assign_batch, batch_format="pyarrow") \
      .write_parquet(path, partition_cols=["ivf_list"])


def ivf_ann_search_partitioned(path: str, queries: dict, k: int = 10,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id", nlist: int = 16,
                               nprobe: int = 4, seed: int = 29,
                               concurrency: int | None = None,
                               round_decimals: int | None = 6):
    """IVF ANN over a corpus laid out by :func:`ivf_partition_write`:
    computes each query's ``nprobe`` nearest centroids, then READS ONLY
    the matching ``ivf_list=<cid>`` partition directories — the scan
    fraction is enforced by the reader, not by a post-read filter. Rows
    still carry their ``ivf_list`` (hive partition column), so per-query
    candidate masking inside the scan is a vectorized membership test,
    and the ranking contract is identical to :func:`ivf_ann_search`
    (same centroids, same rounded-cosine order) — the two paths return
    the same top-k by construction.
    """
    import ray
    import ray.data

    qmat = _normalize(np.asarray(queries["vec"], dtype=np.float64))
    cents = ivf_centroids(qmat.shape[1], nlist, seed)
    qsims = np.round(qmat @ cents.T, 9)
    probe = np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]
    probed_lists = np.unique(probe)
    probe_masks = np.zeros((len(qmat), nlist), dtype=bool)
    for qi in range(len(qmat)):
        probe_masks[qi, probe[qi]] = True

    # partition prune at the read: only files under the probed
    # ``ivf_list=<cid>`` directories are ever opened (ray.data.read_parquet
    # takes explicit FILE paths — hive-partition inference is lost that
    # way, so the scan recomputes the list id from the vector, which is
    # the same pure function that wrote the partition)
    import os
    dirs = [os.path.join(path, f"ivf_list={int(c)}") for c in probed_lists]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return ray.data.from_pandas(pd.DataFrame(
            {"query_id": [], "vec_id": [], "score": [], "rank": []}))
    ds = ray.data.read_parquet(files, columns=[id_col, vec_col])

    bundle_ref = ray.put({"query_id": list(queries["query_id"]),
                          "vec": qmat, "cents": cents,
                          "probe_masks": probe_masks})

    class _PrunedScan:
        def __init__(self):
            b = ray.get(bundle_ref)
            self.qids = b["query_id"]
            self.qmat = b["vec"]
            self.cents = b["cents"]
            self.probe_masks = b["probe_masks"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_vecs_from_arrow(batch.column(vec_col)))
            ids = np.asarray(batch.column(id_col))
            lists = ivf_assign(vecs, self.cents)
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                cand = np.nonzero(self.probe_masks[qi][lists])[0]
                if cand.size == 0:
                    continue
                sims = vecs[cand] @ self.qmat[qi]
                kk = min(k, cand.size)
                top = _topk_rounded(sims, ids[cand], kk, round_decimals)
                out_q.extend([qid] * kk)
                out_id.extend(ids[cand[top]].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table({"query_id": pa.array(out_q),
                             "vec_id": pa.array(out_id),
                             "score": pa.array(out_s, pa.float64())})

    cands = ds.map_batches(_PrunedScan, batch_format="pyarrow",
                           batch_size=4096, concurrency=_pool(concurrency),
                           zero_copy_batch=True)

    return _finalize_topk(cands, k, round_decimals)


def ivf_ann_search(ds, queries: dict, k: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id", nlist: int = 16, nprobe: int = 4,
                   seed: int = 29, concurrency: int | None = None,
                   round_decimals: int | None = 6):
    """IVF (inverted-file) ANN: vectors are bucketed by nearest coarse
    centroid; each query scores ONLY vectors assigned to its ``nprobe``
    nearest centroids — the scan fraction is ~nprobe/nlist by
    construction, independent of data distribution (unlike sign-LSH whose
    probe volume is data-dependent).

    Ray-Data shape: assignment happens inside the same streaming
    ``map_batches`` scan (a filter, not a shuffle) — at 100 TB the win is
    that a PRE-PARTITIONED corpus (``write_parquet`` partitioned by
    ``ivf_list``) turns the probe into a *reader-level* partition prune:
    only nprobe/nlist of the files are opened. Same output schema as
    :func:`ann_search`; recall is exact for vectors in probed lists.
    """
    import ray

    qmat = _normalize(np.asarray(queries["vec"], dtype=np.float64))
    cents = ivf_centroids(qmat.shape[1], nlist, seed)
    qsims = np.round(qmat @ cents.T, 9)
    # top-nprobe centroids per query; stable argsort breaks rounded-sim
    # ties by ascending centroid id (same as SQL ORDER BY s DESC, cid)
    probe = np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]
    probe_masks = np.zeros((len(qmat), nlist), dtype=bool)
    for qi in range(len(qmat)):
        probe_masks[qi, probe[qi]] = True
    bundle_ref = ray.put({"query_id": list(queries["query_id"]),
                          "vec": qmat, "cents": cents,
                          "probe_masks": probe_masks})

    class _IVFScan:
        def __init__(self):
            b = ray.get(bundle_ref)
            self.qids = b["query_id"]
            self.qmat = b["vec"]
            self.cents = b["cents"]
            self.probe_masks = b["probe_masks"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_vecs_from_arrow(batch.column(vec_col)))
            ids = np.asarray(batch.column(id_col))
            assign = ivf_assign(vecs, self.cents)
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                cand = np.nonzero(self.probe_masks[qi][assign])[0]
                if cand.size == 0:
                    continue
                sims = vecs[cand] @ self.qmat[qi]
                kk = min(k, cand.size)
                top = _topk_rounded(sims, ids[cand], kk, round_decimals)
                out_q.extend([qid] * kk)
                out_id.extend(ids[cand[top]].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table({"query_id": pa.array(out_q),
                             "vec_id": pa.array(out_id),
                             "score": pa.array(out_s, pa.float64())})

    cands = ds.map_batches(_IVFScan, batch_format="pyarrow",
                           batch_size=4096, concurrency=_pool(concurrency),
                           zero_copy_batch=True)

    return _finalize_topk(cands, k, round_decimals)


def sign_quantize(vecs: np.ndarray) -> np.ndarray:
    """(n, d) floats → (n, ceil(d/64)) uint64 sign signatures (bit set
    where the coordinate is >= 0). The 32×-compressed form binary-
    quantized retrieval stores instead of the float vectors."""
    bits = np.asarray(vecs) >= 0.0
    n, d = bits.shape
    w = (d + 63) // 64
    padded = np.zeros((n, w * 64), dtype=bool)
    padded[:, :d] = bits
    return np.ascontiguousarray(np.packbits(padded, axis=1)).view(np.uint64)


class _HammingScan:
    """Per-batch packed-Hamming candidates against broadcast query
    signatures: quantize the batch, one XOR + LUT popcount per query,
    local top-(k) by (distance asc, id asc)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) \
            else queries_ref
        self.qids = list(q["query_id"])
        self.qsig = sign_quantize(np.asarray(q["vec"], dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = sign_quantize(_vecs_from_arrow(batch.column(self.vec_col)))
        ids = np.asarray(batch.column(self.id_col))
        k = min(self.k, len(ids))
        out_q, out_id, out_h = [], [], []
        for qi, qid in enumerate(self.qids):
            x = sigs ^ self.qsig[qi]                       # (n, w)
            ham = _POP8[x.view(np.uint8)].reshape(len(ids), -1) \
                .sum(axis=1).astype(np.int64)
            cand = np.lexsort((ids, ham))[:k]
            out_q.extend([qid] * len(cand))
            out_id.extend(ids[cand].tolist())
            out_h.extend(ham[cand].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "vec_id": pa.array(out_id),
                         # negated so the shared desc-score finalizer
                         # ranks ascending distance
                         "score": pa.array([-h for h in out_h],
                                           pa.float64())})


def hamming_ann_search(ds, queries: dict, k: int = 10,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       concurrency: int | None = None,
                       batch_size: int = 4096):
    """Binary-quantized ANN: sign-bit signatures + packed Hamming top-k
    (query-aware first-pass retrieval at 1 bit/dimension; re-rank the
    shortlist with float scores downstream if needed). Same broadcast /
    per-batch-candidates / one-sort-exchange-finalize plan as
    :func:`ann_search`; distances are exact small integers, so the SQL
    oracle reproduces them semantically (sign disagreement count per
    dimension) without replaying the bit packing.
    Returns (query_id, vec_id, hamming, rank)."""
    import ray
    queries_ref = ray.put(queries)
    cands = ds.map_batches(
        _HammingScan,
        fn_constructor_args=(queries_ref, k, vec_col, id_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(concurrency), zero_copy_batch=True)
    out = _finalize_topk(cands, k, round_decimals=None)

    def to_hamming(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.negate(t.column("score")), pa.int64())
        t = t.drop_columns(["score"])
        return t.append_column("hamming", h)

    return out.map_batches(to_hamming, batch_format="pyarrow")


def matryoshka_ann_search(ds, queries: dict, k: int = 10, dims: int = 16,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id", **kw):
    """Truncated-dimension retrieval (matryoshka-style): keep only the
    first ``dims`` coordinates of corpus and query vectors — renormalized
    cosine over the nested prefix, the cheap first pass for embeddings
    trained with nested (MRL) objectives; re-rank the shortlist at full
    dimension downstream. The truncation is a zero-copy reshape +
    FixedSizeList rebuild per batch; ranking then reuses the exact
    :func:`ann_search` plan, so its rounding/tie contract (and the SQL
    oracle pattern, with ``embedding[1:dims]`` slices) carries over."""
    def trunc(t: pa.Table) -> pa.Table:
        v = _vecs_from_arrow(t.column(vec_col))[:, :dims]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(v, dtype=np.float64).ravel(),
                     pa.float64()), dims)
        return pa.table({id_col: t.column(id_col), vec_col: arr})

    q = {"query_id": list(queries["query_id"]),
         "vec": np.asarray(queries["vec"], dtype=np.float64)[:, :dims]}
    return ann_search(ds.map_batches(trunc, batch_format="pyarrow"),
                      q, k=k, vec_col=vec_col, id_col=id_col, **kw)


def rerank_ann_search(ds, queries: dict, k: int = 10, shortlist: int = 50,
                      dims: int = 16, vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      round_decimals: int | None = 6):
    """TWO-STAGE retrieval — the production shape the truncated/binary
    first passes exist for: stage 1 shortlists ``shortlist`` candidates
    per query with :func:`matryoshka_ann_search` over the first ``dims``
    coordinates; stage 2 re-ranks EACH QUERY'S OWN shortlist with exact
    full-dimension cosine and returns the top ``k``.

    The stage-2 scan streams over the corpus once, restricted to the
    broadcast union of shortlists (a per-query ``np.isin`` mask keeps a
    vector that shortlisted for query A from competing for query B), so
    the expensive full-dimension math touches ``n_q × shortlist``
    vectors, not the corpus."""
    import ray

    ds = ds.materialize()        # both stages scan it; pin once
    cand = matryoshka_ann_search(ds, queries, k=shortlist, dims=dims,
                                 vec_col=vec_col, id_col=id_col,
                                 round_decimals=round_decimals).to_pandas()
    per_q = {qid: np.sort(g[id_col].to_numpy())
             for qid, g in cand.groupby("query_id")}
    qmat = _normalize(np.asarray(queries["vec"], dtype=np.float64))
    # fixed output types: most batches at scale shortlist NOTHING, and an
    # untyped empty pa.array([]) would give null-typed columns that
    # mismatch the non-empty blocks' schema
    qid_type = pa.array(list(queries["query_id"])).type
    state_ref = ray.put((list(queries["query_id"]), qmat, per_q))

    def stage2(t: pa.Table) -> pa.Table:
        qids, qm, short = ray.get(state_ref)
        vecs = _normalize(_vecs_from_arrow(t.column(vec_col)))
        ids = np.asarray(t[id_col])
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids):
            mask = np.isin(ids, short.get(qid, ()))
            if not mask.any():
                continue
            sims = qm[qi] @ vecs[mask].T
            out_q.extend([qid] * int(mask.sum()))
            out_id.extend(ids[mask].tolist())
            out_s.extend(sims.tolist())
        return pa.table({"query_id": pa.array(out_q, qid_type),
                         "vec_id": pa.array(out_id,
                                            t.column(id_col).type),
                         "score": pa.array(out_s, pa.float64())})

    cands2 = ds.map_batches(stage2, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _finalize_topk(cands2, k, round_decimals)


class _SQ8Scan:
    """Shortlist pass of :func:`sq8_ann_search`: per batch, uint8-encode
    the corpus vectors against the broadcast per-dimension (min, range)
    and rank by the exact-integer approximate dot with the query codes."""

    def __init__(self, state_ref, shortlist: int, vec_col: str,
                 id_col: str):
        import ray
        qids, qcodes, mn, denom = ray.get(state_ref)
        self.qids = qids
        self.qcodes = qcodes
        self.mn = mn
        self.denom = denom
        self.shortlist = shortlist
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _vecs_from_arrow(batch.column(self.vec_col))
        codes = _sq8_encode(vecs, self.mn, self.denom)
        ids = np.asarray(batch.column(self.id_col))
        approx = self.qcodes @ codes.T              # exact int64
        kk = min(self.shortlist, approx.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            order = np.lexsort((ids, -approx[qi]))[:kk]
            out_q.extend([qid] * len(order))
            out_id.extend(ids[order].tolist())
            out_s.extend(approx[qi, order].tolist())
        return pa.table({"query_id": pa.array(out_q),
                         "vec_id": pa.array(out_id),
                         "score": pa.array(
                             np.asarray(out_s, np.float64))})


def _sq8_encode(vecs: np.ndarray, mn: np.ndarray,
                denom: np.ndarray) -> np.ndarray:
    """⌊(x − mn)·255/denom⌋ clamped to [0, 255]; degenerate dims
    (denom ≤ 0) code to 0. floor (not round) — round() halves break
    differently across engines; each op is one shared IEEE expression."""
    safe = np.where(denom > 0.0, denom, 1.0)
    q = np.floor((vecs - mn) * 255.0 / safe)
    q = np.clip(q, 0.0, 255.0)
    return np.where(denom > 0.0, q, 0.0).astype(np.int64)


def sq8_ann_search(ds, queries: dict, k: int = 10, shortlist: int = 50,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   concurrency: int | None = None,
                   batch_size: int = 4096,
                   round_decimals: int | None = 6):
    """Scalar-quantized (SQ8 / uint8) two-stage ANN — the FAISS-style
    production shape at 1 byte/dimension: per-dimension (min, max)
    trained over the corpus in ONE aggregate pass, corpus and query
    vectors encoded to ⌊(x−mn)·255/(mx−mn)⌋, candidates shortlisted by
    the EXACT-INTEGER approximate dot (codes ≤ 255 ⇒ products ≤ 2¹⁶,
    64-dim sums ≤ 2²² — no float in stage 1 at all), then the
    shortlist re-ranked with exact full-precision cosine (the
    :func:`rerank_ann_search` stage-2 plan: the expensive math touches
    n_q × shortlist vectors, never the corpus).

    Three corpus scans (train, shortlist, rerank) over a pinned
    Dataset; the quantizer state and query codes broadcast once via
    ``ray.put``. Returns (query_id, vec_id, score, rank)."""
    import ray

    ds = ds.materialize()            # three scans; pin once

    def mm_partial(t: pa.Table) -> pa.Table:
        v = _vecs_from_arrow(t.column(vec_col))
        return pa.table({
            "mn": pa.array([v.min(axis=0)]),
            "mx": pa.array([v.max(axis=0)])})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    mn = np.min(np.stack(mm["mn"].to_numpy()), axis=0)
    mx = np.max(np.stack(mm["mx"].to_numpy()), axis=0)
    denom = mx - mn

    qids = list(queries["query_id"])
    qvecs = np.asarray(queries["vec"], dtype=np.float64)
    qcodes = _sq8_encode(qvecs, mn, denom)
    state_ref = ray.put((qids, qcodes, mn, denom))

    cands = ds.map_batches(
        _SQ8Scan, fn_constructor_args=(state_ref, shortlist, vec_col,
                                       id_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(concurrency), zero_copy_batch=True)
    short = _finalize_topk(cands, shortlist,
                           round_decimals=None).to_pandas()

    qid_type = pa.array(qids).type
    per_q = {qid: np.sort(g["vec_id"].to_numpy())
             for qid, g in short.groupby("query_id")}
    qm = _normalize(qvecs)
    state2_ref = ray.put((qids, qm, per_q))

    def stage2(t: pa.Table) -> pa.Table:
        qids2, qm2, short2 = ray.get(state2_ref)
        vecs = _normalize(_vecs_from_arrow(t.column(vec_col)))
        ids = np.asarray(t[id_col])
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(qids2):
            mask = np.isin(ids, short2.get(qid, ()))
            if not mask.any():
                continue
            sims = qm2[qi] @ vecs[mask].T
            out_q.extend([qid] * int(mask.sum()))
            out_id.extend(ids[mask].tolist())
            out_s.extend(sims.tolist())
        return pa.table({"query_id": pa.array(out_q, qid_type),
                         "vec_id": pa.array(out_id,
                                            t.column(id_col).type),
                         "score": pa.array(out_s, pa.float64())})

    cands2 = ds.map_batches(stage2, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _finalize_topk(cands2, k, round_decimals)
