"""Benchmark decontamination: flag corpus documents sharing any word
n-gram with a (small) benchmark/eval set — the standard contamination
check every LLM training-data pipeline runs before training (engine
surface; the reference has no text layer).

Scale shape: the benchmark side is SMALL by nature (eval suites are
thousands of documents, not billions) — its distinct n-grams broadcast
once via ``ray.put`` as ONE sorted numpy unicode array; the corpus
streams through a single vectorized ``map_batches``: whole-batch
tokenization (one Arrow regex split), n-gram assembly as ``n-1``
vectorized string concats over the flattened token array with
doc-boundary masking (the ``_shingle_hashes`` window trick at word
level), and membership as one ``searchsorted`` probe. No shuffle at
all; the corpus text never leaves its block.

Matching is EXACT string membership (not hashes), so the DuckDB oracle
(list-slice n-grams joined against the same benchmark set) agrees
bit-for-bit."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tokens_of_batch(texts, n: int):
    """Flattened non-empty lowercase tokens + per-doc window bookkeeping:
    returns (flat_tokens '<U' array, window_parent doc index per n-gram
    window, n_windows per doc)."""
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks))
    keep = np.asarray(pc.not_equal(flat, ""))
    words = np.asarray(flat)[keep].astype(object)
    parents = parents[keep]
    n_docs = len(texts)
    n_tok = np.bincount(parents, minlength=n_docs)
    return words, parents, np.maximum(n_tok - n + 1, 0)


def doc_ngrams(texts, n: int = 8):
    """All word n-grams of a batch: (grams object array, per-window doc
    index, per-doc window count). Space-joined n-grams built with n-1
    vectorized concats; the windows that cross doc boundaries are
    masked out."""
    words, parents, n_win = _tokens_of_batch(texts, n)
    total = words.shape[0]
    m = total - n + 1
    if m <= 0:
        return np.empty(0, dtype=object), np.empty(0, np.int64), n_win
    gram = words[:m].copy()
    for j in range(1, n):
        gram = gram + " "
        gram = gram + words[j:j + m]
    # a window is valid iff all n tokens share one doc
    valid = parents[:m] == parents[n - 1:]
    return gram[valid], parents[:m][valid], n_win


def benchmark_gram_set(texts, n: int = 8) -> np.ndarray:
    """Sorted distinct n-gram array of the benchmark texts (the
    broadcast side)."""
    grams, _, _ = doc_ngrams(texts, n)
    return np.unique(grams.astype(str))


def gram_hit_counts(texts, bench: np.ndarray, n: int,
                    n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (n_windows, n_hits) of word n-grams against a SORTED
    benchmark gram array — the single probe kernel shared by the flag
    stage below and the filter variant in ``pipelines.llm_prep``."""
    grams, win_doc, n_win = doc_ngrams(texts, n)
    hits = np.zeros(n_docs, dtype=np.int64)
    if grams.shape[0] and bench.shape[0]:
        g = grams.astype(str)
        pos = np.minimum(np.searchsorted(bench, g), bench.shape[0] - 1)
        np.add.at(hits, win_doc[bench[pos] == g], 1)
    return n_win, hits


def contamination_flags(ds, bench_grams: np.ndarray, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Per corpus doc: total n-gram windows, windows hitting the
    benchmark set, and the contaminated flag. ``bench_grams`` must be
    the sorted array from :func:`benchmark_gram_set`."""
    import ray

    bench_ref = ray.put(np.asarray(bench_grams, dtype=str))

    def probe(t: pa.Table) -> pa.Table:
        n_win, hits = gram_hit_counts(t[text_col], ray.get(bench_ref),
                                      n, t.num_rows)
        return pa.table({
            id_col: t[id_col],
            "n_grams": pa.array(n_win, pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array((hits > 0).astype(np.int64)),
        })

    return ds.map_batches(probe, batch_format="pyarrow")
