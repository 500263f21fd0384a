"""Distributed BPE vocabulary training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the canonical
LLM tokenizer-training job: iteratively merge the most frequent adjacent
symbol pair, greedy left-to-right non-overlapping application.

Scale shape (the classic two-level design):

- The corpus is scanned ONCE into a word-frequency table (per-block
  ``value_counts`` partials + groupby sum — the ``top_tokens`` plan);
  every merge iteration then runs over the VOCABULARY, not the corpus.
- Symbol sequences are encoded as single strings with ``"  "`` (two
  spaces) between symbols and one leading/trailing space — merge
  application is then ONE literal ``replace_substring`` per iteration
  (`` a  b `` → `` ab ``), whose greedy left-to-right non-overlapping
  scan is semantically identical in Arrow, Python ``str.replace`` and
  DuckDB ``replace`` (verified on the overlapping ``a a a`` case), so
  the unrolled-CTE SQL oracle is bit-exact.
- Pair counting is vectorized: list-offset arithmetic over the
  flattened token values, per-block pandas partials, groupby sum.
  The winning pair needs only a TOP-1, never a collected table: after
  the groupby each pair lives in exactly one block, so per-block argmax
  candidates (O(blocks) rows) reduce on the driver. Ties break on
  (count desc, left asc, right asc) — UTF-8 byte order equals
  codepoint order, so Python and DuckDB agree.
- The vocab table is re-materialized per iteration (it is vocab-sized,
  tiny next to the corpus) so iteration k+1 does not re-run the first
  k replaces — the PageRank iteration-pinning discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _word_counts(ds, col: str):
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.cast(t[col], pa.string()), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "freq": pc.cast(vc.field("counts"), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("freq", alias_name="freq")))


def _pair_partial(t: pa.Table) -> pa.Table:
    s = pc.utf8_trim(t["s"], " ")
    toks = pc.split_pattern(s, "  ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
        else toks
    vals = np.asarray(toks.values, dtype=object)
    off = np.asarray(toks.offsets, np.int64)
    n_tok = np.diff(off)
    freq = np.asarray(t["freq"], np.int64)
    # pair positions: every flat index except each list's last element
    idx = np.arange(len(vals), dtype=np.int64)
    is_last = np.zeros(len(vals) + 1, bool)
    is_last[off[1:]] = True            # off[i+1] marks end of list i
    keep = ~is_last[idx + 1]
    a, b = vals[keep], vals[idx[keep] + 1]
    w = np.repeat(freq, np.maximum(n_tok - 1, 0))
    if not len(a):
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    g = (pd.DataFrame({"a": a, "b": b, "cnt": w})
         .groupby(["a", "b"], sort=False).sum().reset_index())
    return pa.table({"a": pa.array(g["a"], pa.string()),
                     "b": pa.array(g["b"], pa.string()),
                     "cnt": pa.array(g["cnt"], pa.int64())})


def _block_top1(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return t
    df = t.to_pandas()
    df = df.sort_values(["cnt", "a", "b"],
                        ascending=[False, True, True])
    return pa.Table.from_pandas(df.head(1), preserve_index=False)


def bpe_train(ds, n_merges: int = 8, col: str = "text") -> pd.DataFrame:
    """→ pandas (step, left_sym, right_sym, merged, pair_count): the
    merge table of ``n_merges`` BPE iterations over the whitespace-token
    vocabulary of ``ds[col]``. Stops early if no pair remains."""
    rows, _ = _train(ds, n_merges, col)
    return pd.DataFrame(rows, columns=["step", "left_sym", "right_sym",
                                       "merged", "pair_count"])


def bpe_token_counts(ds, n_merges: int = 8, k: int = 30,
                     col: str = "text") -> pd.DataFrame:
    """Corpus token frequencies UNDER the learned BPE vocabulary: train
    ``n_merges`` merges, then count final symbols — weighted by word
    frequency over the ALREADY-AGGREGATED vocab table, so applying the
    tokenizer to the corpus costs zero additional corpus scans.
    → pandas (token, n), top ``k`` by (n desc, token asc)."""
    from ray.data.aggregate import Sum

    _, enc = _train(ds, n_merges, col)

    def tok_partial(t: pa.Table) -> pa.Table:
        s = pc.utf8_trim(t["s"], " ")
        toks = pc.split_pattern(s, "  ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        vals = np.asarray(toks.values, dtype=object)
        n_tok = np.diff(np.asarray(toks.offsets, np.int64))
        w = np.repeat(np.asarray(t["freq"], np.int64), n_tok)
        g = (pd.DataFrame({"token": vals, "n": w})
             .groupby("token", sort=False).sum().reset_index())
        return pa.table({"token": pa.array(g["token"], pa.string()),
                         "n": pa.array(g["n"], pa.int64())})

    out = (enc.map_batches(tok_partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n"))
           .sort(["n", "token"], descending=[True, False]).limit(k)
           .to_pandas())
    return out.reset_index(drop=True)


def _train(ds, n_merges: int, col: str):
    """Shared merge loop: → (merge rows, final vocab-encoding Dataset)."""
    from ray.data.aggregate import Sum

    words = _word_counts(ds, col)
    enc = words.map_batches(
        lambda t: pa.table({
            "freq": t["freq"],
            "s": pc.replace_substring_regex(t["word"], pattern="(.)",
                                            replacement=" \\1 ")}),
        batch_format="pyarrow").materialize()

    rows = []
    for step in range(1, n_merges + 1):
        cand = (enc.map_batches(_pair_partial, batch_format="pyarrow")
                .groupby(["a", "b"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .map_batches(_block_top1, batch_format="pyarrow")
                .to_pandas())
        if cand.empty:
            break
        cand = cand.sort_values(["cnt", "a", "b"],
                                ascending=[False, True, True])
        a, b = str(cand.iloc[0]["a"]), str(cand.iloc[0]["b"])
        cnt = int(cand.iloc[0]["cnt"])
        rows.append((step, a, b, a + b, cnt))
        pat, rep = f" {a}  {b} ", f" {a}{b} "
        enc = enc.map_batches(
            lambda t, pat=pat, rep=rep: pa.table({
                "freq": t["freq"],
                "s": pc.replace_substring(t["s"], pattern=pat,
                                          replacement=rep)}),
            batch_format="pyarrow").materialize()
    return rows, enc
