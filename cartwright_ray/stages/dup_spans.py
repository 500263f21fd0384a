"""Corpus-internal duplicate-substring detection — per document, how
much of its text is covered by word n-grams that occur elsewhere in the
corpus (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better": repeated ~50-token substrings are the dominant
duplication mode exact doc-dedup misses). Engine surface — the
reference (jataware/cartwright) has no text layer.

Lee et al. build a suffix array; the practical distributed equivalent
is the fixed-width gram pass used here (the same trade ``decontam``
makes): every word ``n``-gram window is keyed and windows whose gram
occurs ≥2 times corpus-wide (optionally: in ≥2 distinct docs) are
flagged, then per-doc coverage is the union of the flagged fixed-width
windows — an exact integer gaps-and-islands sum, no interval
materialization.

Scale shape:

- Pass 1 (one corpus scan, ``map_batches``): tokenization and window
  assembly are ``decontam.doc_ngrams`` — one Arrow regex split, n-1
  vectorized concats. Each window emits ONE narrow row
  ``(doc_id, pos, n_tok, h1, h2)`` where (h1, h2) is the 128-bit
  gram siphash (``dedup._content_hash128``'s convention): the exchange
  carries ~40 bytes per token, never the gram strings.
- ONE hash exchange on (h1, h2) co-locates each gram's windows;
  a whole-block reduceat kernel keeps members of groups with ≥2
  windows (``cross_doc_only``: ≥2 distinct docs) — output shrinks to
  the duplicated windows only.
- ONE doc-keyed exchange + gaps-and-islands kernel: per doc,
  ``n_dup_grams`` = flagged windows, ``n_dup_tokens`` = union size of
  the fixed-width intervals = ``n + Σ min(gapᵢ, n)`` over sorted
  positions — all integer.
- Docs with no duplicated window surface with zeros via a broadcast
  left-attach of the O(dup docs) rollup onto the O(docs) stats table
  (both narrow; swap to ``equi_join_shuffle`` past the broadcast
  bound exactly as ``exact_dedup`` documents).

The SQL oracle replays grams as STRINGS (list-slice + join) — engine
hashes and oracle strings agree unless a 128-bit collision occurs,
the same documented stance as ``exact_dedup``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .decontam import doc_ngrams
from .partition import hash_partitioned

def _empty_gram_rows(id_type: pa.DataType) -> pa.Table:
    """Schema-stable empty gram-row table; doc_id keeps the input's
    id type (int or string corpora both work unchanged)."""
    return pa.table({"doc_id": pa.array([], id_type),
                     "pos": pa.array([], pa.int64()),
                     "n_tok": pa.array([], pa.int64()),
                     "h1": pa.array([], pa.uint64()),
                     "h2": pa.array([], pa.uint64())})


def _empty_rollup(id_type: pa.DataType) -> pa.Table:
    return pa.table({"doc_id": pa.array([], id_type),
                     "n_dup_grams": pa.array([], pa.int64()),
                     "n_dup_tokens": pa.array([], pa.int64())})


def _gram_rows(t: pa.Table, n: int, text_col: str,
               id_col: str) -> pa.Table:
    """(doc_id, pos, n_tok, h1, h2) — one row per word n-gram window."""
    grams, win_doc, n_win = doc_ngrams(t[text_col], n)
    if grams.shape[0] == 0:
        return _empty_gram_rows(t[id_col].type)
    # window position within ITS doc: windows come out doc-grouped and
    # in order (the flatten preserves batch order), so a running index
    # rebased at each doc boundary is the in-doc position
    new = np.r_[True, win_doc[1:] != win_doc[:-1]]
    starts = np.flatnonzero(new)
    pos = np.arange(win_doc.shape[0], dtype=np.int64) \
        - np.repeat(starts, np.r_[starts[1:], win_doc.shape[0]] - starts)
    # token counts per doc (window count + n - 1 where windows exist)
    n_tok_doc = np.asarray(n_win, np.int64) + (n - 1)
    ids = np.asarray(t[id_col])
    g = grams.astype(object)
    h1 = pd.util.hash_array(g, hash_key="cartwright_dupg0")
    h2 = pd.util.hash_array(g, hash_key="cartwright_dupg1")
    return pa.table({
        "doc_id": pa.array(ids[win_doc], t[id_col].type),
        "pos": pa.array(pos),
        "n_tok": pa.array(n_tok_doc[win_doc]),
        "h1": pa.array(h1, pa.uint64()),
        "h2": pa.array(h2, pa.uint64())})


def _dup_members(t: pa.Table, cross_doc_only: bool) -> pa.Table:
    """Keep windows whose gram group (co-located by the hash exchange)
    has ≥2 windows — or ≥2 distinct docs when ``cross_doc_only``."""
    if t.num_rows == 0:
        return t
    h1 = np.asarray(t["h1"], np.uint64)
    h2 = np.asarray(t["h2"], np.uint64)
    doc = np.asarray(t["doc_id"])
    order = np.lexsort((doc, h2, h1))
    h1, h2, doc = h1[order], h2[order], doc[order]
    new = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
    gid = np.cumsum(new) - 1
    sizes = np.bincount(gid)
    if cross_doc_only:
        # distinct docs per group: doc changes within a group, counted
        # on the (h1, h2, doc)-sorted layout
        ddoc = np.r_[True, doc[1:] != doc[:-1]] | new
        ndoc = np.bincount(gid, weights=ddoc).astype(np.int64)
        keep_grp = ndoc >= 2
    else:
        keep_grp = sizes >= 2
    keep = keep_grp[gid]
    idx = order[keep]
    return t.take(pa.array(idx))


def _doc_rollup(t: pa.Table, n: int) -> pa.Table:
    """Per doc (co-located by the doc exchange): flagged-window count
    and covered-token union ``n + Σ min(gap, n)`` per island run."""
    if t.num_rows == 0:
        return _empty_rollup(t["doc_id"].type)
    doc = np.asarray(t["doc_id"])
    pos = np.asarray(t["pos"], np.int64)
    order = np.lexsort((pos, doc))
    doc, pos = doc[order], pos[order]
    new = np.r_[True, doc[1:] != doc[:-1]]
    gid = np.cumsum(new) - 1
    counts = np.bincount(gid)
    gaps = pos[1:] - pos[:-1]
    same = ~new[1:]
    add = np.zeros(len(doc), np.int64)
    add[0] = n
    add[1:] = np.where(same, np.minimum(gaps, n), n)
    covered = np.bincount(gid, weights=add).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(doc[new], t["doc_id"].type),
        "n_dup_grams": pa.array(counts.astype(np.int64)),
        "n_dup_tokens": pa.array(covered)})


def duplicate_gram_stats(ds, n: int = 8, text_col: str = "text",
                         id_col: str = "doc_id",
                         cross_doc_only: bool = False):
    """→ Dataset (doc_id, n_tokens, n_dup_grams, n_dup_tokens): per
    document, its token count, the number of word ``n``-gram windows
    whose gram repeats corpus-wide, and the exact token count covered
    by those windows. Every doc appears; dup columns are 0 where
    nothing repeats (including docs shorter than ``n`` tokens)."""
    from ..joins.equi_join import equi_join
    from ..stages.partition import drop_empty_blocks

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    if not isinstance(id_type, pa.DataType):
        # pandas-backed datasets report Python/numpy types
        id_type = pa.string() if id_type in (str, object) \
            else pa.from_numpy_dtype(np.dtype(id_type))
    rows = ds.map_batches(
        lambda t: _gram_rows(t, n, text_col, id_col),
        batch_format="pyarrow")
    rows = rows.materialize()  # feeds the gram exchange AND doc stats

    grouped = hash_partitioned(rows, ["h1", "h2"])
    if grouped is not None:
        dups = grouped.map_batches(
            lambda t: _dup_members(t, cross_doc_only),
            batch_format="pyarrow", batch_size=None)
        bydoc = hash_partitioned(dups, ["doc_id"])
    else:
        bydoc = None
    if bydoc is not None:
        rollup_ds = bydoc.map_batches(
            lambda t: _doc_rollup(t, n),
            batch_format="pyarrow", batch_size=None)
        rollup_ds = drop_empty_blocks(rollup_ds)
    else:
        rollup_ds = None
    rollup_schema = pa.schema([("doc_id", id_type),
                               ("n_dup_grams", pa.int64()),
                               ("n_dup_tokens", pa.int64())])
    rollup = pa.Table.from_pandas(rollup_ds.to_pandas(),
                                  schema=rollup_schema) \
        if rollup_ds is not None else rollup_schema.empty_table()

    # per-doc token counts INCLUDING docs with no window (< n tokens):
    # a cheap second stats pass over the source docs, not the gram rows
    def doc_stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t[text_col]), r"\s+")
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks))
        keep = np.asarray(pc.not_equal(flat, ""))
        n_tok = np.bincount(parents[keep], minlength=t.num_rows)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok.astype(np.int64))})

    stats = ds.map_batches(doc_stats, batch_format="pyarrow")
    # O(dup docs) rollup broadcast-attached onto the O(docs) stats
    # stream (swap to equi_join_shuffle past the broadcast bound)
    if id_col != "doc_id":
        rollup = rollup.rename_columns(
            [id_col if c == "doc_id" else c for c in rollup.column_names])
    joined = equi_join(stats, rollup, on=id_col, how="left")

    def fill_zero(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = {c: t[c] for c in (id_col, "n_tokens")}
        for c in ("n_dup_grams", "n_dup_tokens"):
            out[c] = pc.coalesce(t[c].cast(pa.int64()),
                                 pa.scalar(0, pa.int64()))
        return pa.table(out)

    return joined.map_batches(fill_zero, batch_format="pyarrow")
