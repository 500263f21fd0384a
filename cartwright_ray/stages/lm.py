"""Corpus-trained n-gram language-model scoring — the CCNet-style
perplexity quality signal: fit a word-bigram model over the corpus
itself (production pipelines ship a pretrained KenLM; the *engine
shape* is identical — a broadcastable model scored per batch), then
score every document by its mean transition log-probability. Low
scores flag token-soup / boilerplate documents for filtering.

Two streaming passes, the same template as ``dedup.line_dedup``:

1. **Fit** (map → narrow sort): per-batch PARTIAL bigram and
   history-unigram counts cross the exchange as narrow tagged
   ``(key, n)`` rows (``pc.value_counts`` — no per-row Python); a
   range sort co-locates equal keys and a whole-block segment-sum
   finalizes the model. The model — O(vocab + distinct bigrams), the
   small side by construction — is broadcast once via ``ray.put``.
2. **Score** (pure map): each batch encodes words against the model
   vocab with ``pc.index_in`` (C kernel), looks up bigram counts by
   packed ``left * V + right`` key (``np.searchsorted``), and computes
   add-one-smoothed

       log P(w_i | w_{i-1}) = log(c(w_{i-1}, w_i) + 1)
                            - log(h(w_{i-1}) + V)

   where ``h`` counts occurrences as a bigram HISTORY (doc-final words
   excluded) and ``V`` is the corpus vocabulary size. A document's
   score is the mean over its transitions (0.0 for documents with
   fewer than two words), floored at 1e-6 like the other float oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# bigram models over natural-language vocabularies are broadcast-sized
# by construction (KenLM models ship to every CCNet worker the same
# way); this bounds the degenerate high-entropy-corpus case
_MODEL_LIMIT = 30_000_000

_EMPTY_PARTIAL = pa.schema([("k", pa.string()), ("n", pa.int64())])


def _doc_words(t: pa.Table, col: str):
    """(parents int64[n_words], words pa.StringArray) — whitespace
    tokens with empties dropped, parent-indexed per document."""
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    toks = pc.split_pattern_regex(pc.cast(c, pa.string()), r"\s+")
    flat = pc.list_flatten(toks)
    parents = np.asarray(pc.list_parent_indices(toks))
    keep = np.asarray(pc.not_equal(flat, ""))
    flat = flat.filter(pa.array(keep))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return parents[keep], flat


def _bigram_left_idx(parents: np.ndarray) -> np.ndarray:
    """Word positions that START a bigram (next word exists in the
    same document)."""
    if len(parents) == 0:
        return np.zeros(0, np.int64)
    return np.flatnonzero(parents[1:] == parents[:-1])


def _tagged(tag: str, arr) -> pa.Array:
    """Vectorized tag prefix (scalar broadcasts in the element-wise
    join kernel)."""
    out = pc.binary_join_element_wise(tag, arr, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) \
        else out


def fit_bigram_lm(ds, col: str = "text", model_limit: int = _MODEL_LIMIT):
    """→ (vocab pa.StringArray sorted, hist int64[V], bigram_keys
    sorted int64, bigram_counts int64, V). Counts are corpus-global."""

    def partials(t: pa.Table) -> pa.Table:
        parents, words = _doc_words(t, col)
        if len(parents) == 0:
            return _EMPTY_PARTIAL.empty_table()
        li = _bigram_left_idx(parents)
        lefts = words.take(pa.array(li, pa.int64()))
        rights = words.take(pa.array(li + 1, pa.int64()))
        big = pc.binary_join_element_wise(lefts, rights, "\x00")
        ks, ns = [], []
        for tag, arr in (("u", words), ("h", lefts), ("b", big)):
            vc = pc.value_counts(arr)
            ks.append(_tagged(tag, vc.field("values")))
            ns.append(vc.field("counts"))
        return pa.table({
            "k": pa.concat_arrays([k.cast(pa.string()) for k in ks]),
            "n": pa.concat_arrays(ns)})

    def segment_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = np.asarray(t["k"], dtype=object)
        n = np.asarray(t["n"])
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        return pa.table({"k": pa.array(k[starts], pa.string()),
                         "n": pa.array(np.add.reduceat(n, starts),
                                       pa.int64())})

    rows = (ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
              .sort("k")
              .map_batches(segment_sum, batch_format="pyarrow",
                           batch_size=None)
              .take_all())
    if len(rows) > model_limit:
        raise ValueError(f"{len(rows)} model rows exceed model_limit="
                         f"{model_limit}")
    # driver-side model assembly: O(model rows), the bounded small side
    vocab, hist_d, bi = [], {}, {}
    for r in rows:
        tag, body = r["k"][0], r["k"][1:]
        if tag == "u":
            vocab.append(body)
        elif tag == "h":
            hist_d[body] = r["n"]
        else:
            bi[body] = r["n"]
    vocab.sort()
    V = len(vocab)
    hist = np.array([hist_d.get(w, 0) for w in vocab], np.int64)
    idx = {w: i for i, w in enumerate(vocab)}
    bkeys = np.array([idx[a] * V + idx[b] for a, b in
                      (key.split("\x00", 1) for key in bi)], np.int64)
    bcounts = np.array(list(bi.values()), np.int64)
    order = np.argsort(bkeys)
    return (pa.array(vocab, pa.string()), hist,
            bkeys[order], bcounts[order], V)


def lm_score(ds, col: str = "text", id_col: str = "doc_id",
             model_limit: int = _MODEL_LIMIT):
    """→ (id_col, n_bigrams, avg_logprob) one row per document;
    ``avg_logprob = floor(mean log P * 1e6) / 1e6`` (0.0 when the
    document has no transitions)."""
    import ray

    model_ref = ray.put(fit_bigram_lm(ds, col, model_limit))

    def score(t: pa.Table) -> pa.Table:
        vocab, hist, bkeys, bcounts, V = ray.get(model_ref)
        parents, words = _doc_words(t, col)
        n_docs = len(t)
        if len(parents) == 0 or V == 0:
            return pa.table({
                id_col: t[id_col],
                "n_bigrams": pa.array(np.zeros(n_docs, np.int64)),
                "avg_logprob": pa.array(np.zeros(n_docs, np.float64))})
        # C-kernel vocab encode; nulls (foreign words — impossible when
        # scoring the fit corpus) clamp to 0 defensively
        ids = np.asarray(pc.fill_null(
            pc.index_in(words, value_set=vocab), 0), np.int64)
        li = _bigram_left_idx(parents)
        lid, rid = ids[li], ids[li + 1]
        key = lid * V + rid
        pos = np.searchsorted(bkeys, key)
        ok = (pos < len(bkeys)) & (bkeys[np.minimum(pos, len(bkeys) - 1)]
                                   == key)
        c = np.where(ok, bcounts[np.minimum(pos, len(bkeys) - 1)], 0)
        lp = np.log(c + 1.0) - np.log(hist[lid] + float(V))
        nb = np.bincount(parents[li], minlength=n_docs)
        tot = np.zeros(n_docs)
        np.add.at(tot, parents[li], lp)
        avg = np.where(nb > 0, tot / np.maximum(nb, 1), 0.0)
        avg = np.floor(avg * 1e6) / 1e6
        return pa.table({
            id_col: t[id_col],
            "n_bigrams": pa.array(nb, pa.int64()),
            "avg_logprob": pa.array(avg, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
