"""TF-IDF scoring and an inverted-index sink over a document corpus.

Two classic text-pipeline operators expressed Ray-Data-first:

* :func:`tfidf_top_terms` — two passes: a document-frequency aggregation
  whose shuffle carries ``(token, partial_df)`` rows (block-local
  distinct first, so the shuffle is bounded by per-block vocabulary),
  then a broadcast of the (capped) vocabulary table and one vectorized
  scoring pass that emits each document's top terms. The broadcast is
  the documented scale boundary: vocabulary is capped (``max_vocab`` by
  descending df) so the lookup stays O(vocab), never O(corpus).
* :func:`build_inverted_index` / :func:`read_postings` — an index sink
  that writes ``(token, doc_id, tf)`` postings as parquet PARTITIONED by
  a token-hash bucket, so a probe for specific tokens opens only the
  matching bucket directories (reader-level pruning — the same pattern
  as the IVF partitioned ANN path in ``ann.py``), and a failed build can
  resume per-bucket.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .partition import key_segments

_SPLIT = r"\s+"


def _doc_token_tf(t: pa.Table, col: str, id_col: str) -> pd.DataFrame:
    """(doc_id, token, tf) for a batch — Arrow split + pandas groupby
    (C kernels; the only Python per row is none)."""
    toks = pc.split_pattern_regex(pc.cast(t[col], pa.string()), _SPLIT)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    ids = np.repeat(np.asarray(pc.cast(t[id_col], pa.int64())), counts)
    df = pd.DataFrame({"doc_id": ids,
                       "token": flat.to_numpy(zero_copy_only=False)})
    df = df[df["token"] != ""]
    return (df.groupby(["doc_id", "token"], sort=False)
            .size().rename("tf").reset_index())


def document_frequencies(ds, col: str = "text", id_col: str = "doc_id",
                         min_df: int = 1, max_vocab: int | None = None):
    """(token, df) vocabulary table as a Dataset; block-local distinct
    keeps the shuffle at (token, partial) granularity."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        d = _doc_token_tf(t, col, id_col)
        vc = d["token"].value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "df": pa.array(vc.to_numpy(), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("df", alias_name="df")))
    if min_df > 1:
        out = out.filter(expr=f"df >= {min_df}")
    if max_vocab is not None:
        out = out.sort(["df", "token"], descending=[True, False]) \
                 .limit(max_vocab)
    return out


def tfidf_top_terms(ds, col: str = "text", id_col: str = "doc_id",
                    top_per_doc: int = 3, min_df: int = 1,
                    max_vocab: int | None = None):
    """Per-document top-``top_per_doc`` terms by ``tf * ln(N/df)``.

    Returns (doc_id, term_rank, token, tf, score) with score floored at
    1e-6 (cross-engine ``ln`` may differ in the last ulp — numpy's SIMD
    log vs libm; on the fixed testdata the closest score sits ~1e-3
    from a 1e-6 floor boundary and adjacent scores differ by >1e-6, so
    the floored values and the ranking are stable in both engines).
    """
    import ray

    n_docs = ds.count()
    vocab = document_frequencies(ds, col, id_col, min_df,
                                 max_vocab).to_pandas()
    df_map = ray.put(dict(zip(vocab["token"], vocab["df"].astype(float))))

    def score(t: pa.Table) -> pa.Table:
        dfm = ray.get(df_map)
        d = _doc_token_tf(t, col, id_col)
        dfv = d["token"].map(dfm)
        keep = dfv.notna()
        d, dfv = d[keep], dfv[keep]
        sc = d["tf"].to_numpy(np.float64) * np.log(n_docs / dfv.to_numpy())
        # per-doc rank by (-score, token): docs are whole rows, so every
        # doc's terms are complete within the batch
        order = np.lexsort((d["token"].to_numpy(),
                            -sc, d["doc_id"].to_numpy()))
        starts, seg = key_segments(d["doc_id"].to_numpy()[order])
        rank = np.arange(order.size) - starts[seg]
        kept = order[rank < top_per_doc]
        kr = rank[rank < top_per_doc]
        return pa.table({
            "doc_id": pa.array(d["doc_id"].to_numpy()[kept], pa.int64()),
            "term_rank": pa.array(kr, pa.int64()),
            "token": pa.array(d["token"].to_numpy()[kept], pa.string()),
            "tf": pa.array(d["tf"].to_numpy()[kept], pa.int64()),
            "score": pa.array(np.floor(sc[kept] * 1e6) / 1e6,
                              pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def token_bucket(tokens, num_buckets: int) -> np.ndarray:
    """Deterministic token -> bucket via ``pd.util.hash_array`` with a
    fixed key (siphash C loop — content-stable across processes, unlike
    the per-process-salted ``hash()``, and vectorized, unlike a Python
    crc32 loop)."""
    arr = np.asarray(list(tokens) if not isinstance(tokens, np.ndarray)
                     else tokens, dtype=object)
    h = pd.util.hash_array(arr, hash_key="cartwright_idx00")  # 16 bytes
    return (h % np.uint64(num_buckets)).astype(np.int64)


def build_inverted_index(ds, path: str, col: str = "text",
                         id_col: str = "doc_id", num_buckets: int = 16):
    """Write (token, doc_id, tf) postings partitioned by token-hash
    bucket. One directory per bucket -> resumable + probe-prunable."""

    def explode(t: pa.Table) -> pa.Table:
        d = _doc_token_tf(t, col, id_col)
        return pa.table({
            "token": pa.array(d["token"].to_numpy(), pa.string()),
            "doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
            "tf": pa.array(d["tf"].to_numpy(), pa.int64()),
            "bucket": pa.array(token_bucket(
                d["token"].to_numpy(), num_buckets)),
        })

    ds.map_batches(explode, batch_format="pyarrow") \
      .write_parquet(path, partition_cols=["bucket"])


def read_postings(path: str, tokens: list[str], num_buckets: int = 16):
    """Posting stats for probe tokens, opening ONLY the bucket
    partitions the tokens hash to (reader-level pruning). Returns a
    Dataset (token, df, total_tf)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    buckets = sorted({int(b) for b in token_bucket(tokens, num_buckets)})
    dirs = [os.path.join(path, f"bucket={b}") for b in buckets]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return ray.data.from_arrow(pa.table({
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "total_tf": pa.array([], pa.int64())}))
    ds = ray.data.read_parquet(files, columns=["token", "doc_id", "tf"])
    tok_set = pa.array(sorted(set(tokens)))

    def probe(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["token"], value_set=tok_set))

    return (ds.map_batches(probe, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Count(alias_name="df"),
                       Sum("tf", alias_name="total_tf")))
