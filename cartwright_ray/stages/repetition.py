"""Repetition-based quality signals (the Gopher-rule family from the
public "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher" paper, Rae et al. 2021, Appendix A): documents
dominated by duplicate lines or by one repeated n-gram are boilerplate/
spam and get filtered before LLM training. Engine surface beyond the
reference (no text layer there).

Everything is integer counts so a DuckDB oracle replays it exactly
(ratios are the caller's division; same rule as textstats). One
streaming ``map_batches``, no shuffle:

* ``dup_line_chars`` / ``line_chars``: characters in lines occurring
  more than once within the doc (each occurrence counted) vs all line
  characters — one lexsort + segment reduction across the whole batch;
* ``top2_count`` / ``top2_chars``: occurrences of the doc's most
  frequent word 2-gram (ties broken by lexicographically smallest
  gram — the SQL ``row_number() OVER (ORDER BY c DESC, g)`` order) and
  the characters it covers (count × gram length).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .decontam import doc_ngrams
from .partition import key_segments


def _group_counts(doc_idx: np.ndarray, items: np.ndarray):
    """Distinct (doc, item) triples of a batch: returns (doc, item,
    count) with docs contiguous — one lexsort over the flattened pairs,
    no per-doc Python."""
    if items.shape[0] == 0:
        return (np.empty(0, np.int64), np.empty(0, dtype=object),
                np.empty(0, np.int64))
    order = np.lexsort((items, doc_idx))
    d, it = doc_idx[order], items[order]
    new = np.ones(d.shape[0], bool)
    new[1:] = (d[1:] != d[:-1]) | (it[1:] != it[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.r_[starts, d.shape[0]])
    return d[starts], it[starts], counts


def repetition_signals(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Append the integer repetition counters per doc — see module
    docstring for the column contract."""

    def signals(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        texts = t[text_col]

        # ---- duplicate-line characters
        lines = pc.split_pattern(texts, "\n")
        flat = pc.list_flatten(lines)
        parents = np.asarray(pc.list_parent_indices(lines))
        line_arr = np.asarray(flat).astype(object)
        line_len = np.asarray(pc.cast(pc.utf8_length(flat), pa.int64()))
        line_chars = np.zeros(n_docs, np.int64)
        np.add.at(line_chars, parents, line_len)
        d, li, c = _group_counts(parents, line_arr)
        li_len = np.fromiter((len(x) for x in li), np.int64,
                             count=li.shape[0])
        dup_mask = c > 1
        dup_chars = np.zeros(n_docs, np.int64)
        np.add.at(dup_chars, d[dup_mask],
                  (li_len * c)[dup_mask])

        # ---- top word-2-gram
        grams, win_doc, _ = doc_ngrams(texts, n=2)
        top_gram = np.full(n_docs, None, dtype=object)
        top_count = np.zeros(n_docs, np.int64)
        if grams.shape[0]:
            gd, gi, gc = _group_counts(win_doc, grams)
            # first row per doc under (count desc, gram asc) = the top
            order = np.lexsort((gi, -gc, gd))
            gd, gi, gc = gd[order], gi[order], gc[order]
            starts, _seg = key_segments(gd)
            top_gram[gd[starts]] = gi[starts]
            top_count[gd[starts]] = gc[starts]
        top_len = np.fromiter(
            (len(g) if g is not None else 0 for g in top_gram),
            np.int64, count=n_docs)

        return pa.table({
            id_col: t[id_col],
            "line_chars": pa.array(line_chars, pa.int64()),
            "dup_line_chars": pa.array(dup_chars, pa.int64()),
            "top2_gram": pa.array(list(top_gram), pa.string()),
            "top2_count": pa.array(top_count, pa.int64()),
            "top2_chars": pa.array(top_count * top_len, pa.int64()),
        })

    return ds.map_batches(signals, batch_format="pyarrow")
