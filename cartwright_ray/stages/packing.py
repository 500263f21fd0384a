"""Training-sequence layout operators: token-budget packing and a
seeded deterministic global shuffle (engine surface — the reference,
jataware/cartwright, is a column classifier; these are the layout steps
an LLM training-data pipeline runs after filtering/dedup).

Both need a GLOBAL running offset over a sorted corpus — the one
primitive Ray Data lacks natively. The pattern here keeps it
scale-safe:

1. project the narrow columns and ``sort`` on the order key (one range
   exchange of (id, weight) pairs only — the text never moves);
2. ``materialize`` the sorted dataset and reduce ONE partial row per
   block (min key, max key, weight sum) — O(num_blocks) to the driver,
   never O(rows);
3. broadcast the per-block exclusive prefix and run a second
   whole-block pass over the SAME materialized blocks (``batch_size=
   None`` maps one batch per block; a block is identified by its
   (min, max) key range, which is unique because keys are) — offset =
   block prefix + in-block exclusive cumsum, all vectorized.

The driver holds O(num_blocks) partials; at 100 TB with 128 MB blocks
that is ~800k tiny rows — fine. (A tree prefix-reduction drops in if
block counts ever grow past that.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_counts_narrow(ds, text_col: str = "text",
                        id_col: str = "doc_id"):
    """(id, n_tokens) projection: lowercase, split on ``\\s+``, drop
    empty tokens — EXACTLY DuckDB's ``len(list_filter(
    regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))`` so SQL
    oracles replay it verbatim (same rule as textstats.n_words)."""

    def tok(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), r"\s+")
        flat = pc.list_flatten(toks)
        parents = np.asarray(pc.list_parent_indices(toks))
        nonempty = np.asarray(pc.cast(pc.not_equal(flat, ""), pa.int64()))
        n_tokens = np.zeros(t.num_rows, np.int64)
        np.add.at(n_tokens, parents, nonempty)
        return pa.table({id_col: t[id_col],
                         "n_tokens": pa.array(n_tokens, pa.int64())})

    return ds.map_batches(tok, batch_format="pyarrow")


def _block_exclusive_prefix(mat_ds, key_col: str, weight_col: str | None):
    """Per-block exclusive prefix of ``weight_col`` (or of row counts
    when None) over a materialized key-sorted dataset. Returns
    ``{(min_key, max_key): prefix}``."""

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"__min": pa.array([], pa.int64()),
                          "__max": pa.array([], pa.int64()),
                          "__sum": pa.array([], pa.int64())})
        # Ray's sort can emit EMPTY blocks (rows < partitions); pc.min
        # on them is null, and a null __min crashes the sort_values
        # below (ADVICE r04). An empty block contributes 0 to the
        # prefix, so it simply drops out here.
        if t.num_rows == 0:
            return empty
        k = t[key_col]
        w = (t.num_rows if weight_col is None
             else pc.sum(t[weight_col]).as_py() or 0)
        return pa.table({"__min": [pc.min(k).as_py()],
                         "__max": [pc.max(k).as_py()],
                         "__sum": pa.array([int(w)], pa.int64())})

    parts = (mat_ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
             .to_pandas().sort_values("__min"))
    # belt-and-braces for runtimes that skip the UDF on empty blocks
    # and emit null rows instead
    parts = parts[parts["__min"].notna()]
    prefix: dict = {}
    run = 0
    for mn, mx, s in zip(parts["__min"], parts["__max"], parts["__sum"]):
        prefix[(mn, mx)] = run
        run += int(s)
    return prefix


def pack_token_budget(ds, budget: int = 512, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Concat-then-chunk sequence packing: documents are laid out
    end-to-end in ``id_col`` order and cut into fixed ``budget``-token
    training bins. Emits per doc: ``n_tokens``, its global ``start_tok``
    offset, and the first/last bin it lands in (``bin_start`` /
    ``bin_end`` — a long doc spans several bins; an empty doc occupies
    its insertion point). The standard GPT-style packing layout; the
    greedy first-fit variant (bin resets when a doc would split) is a
    different op because it is a sequential recurrence, not a prefix
    sum."""
    import ray

    mat = token_counts_narrow(ds, text_col, id_col).sort(id_col) \
        .materialize()
    prefix = _block_exclusive_prefix(mat, id_col, "n_tokens")
    pref_ref = ray.put(prefix)

    def attach(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if t.num_rows == 0:     # empty sort block: no prefix entry
            return pa.table({
                id_col: ids, "n_tokens": t["n_tokens"],
                "start_tok": pa.array([], pa.int64()),
                "bin_start": pa.array([], pa.int64()),
                "bin_end": pa.array([], pa.int64())})
        base = ray.get(pref_ref)[(pc.min(ids).as_py(),
                                  pc.max(ids).as_py())]
        nt = np.asarray(t["n_tokens"], dtype=np.int64)
        start = base + np.cumsum(nt) - nt
        last = start + np.maximum(nt, 1) - 1
        return pa.table({
            id_col: ids, "n_tokens": t["n_tokens"],
            "start_tok": pa.array(start, pa.int64()),
            "bin_start": pa.array(start // budget, pa.int64()),
            "bin_end": pa.array(last // budget, pa.int64()),
        })

    return mat.map_batches(attach, batch_format="pyarrow",
                           batch_size=None)


# ---------------------------------------------------------------------------
# greedy first-fit sequence packing — the SEQUENTIAL-recurrence variant
# pack_token_budget's docstring rules out of the prefix-sum layout: the
# bin resets whenever the next document would split, so every document's
# bin depends on every earlier document.
# ---------------------------------------------------------------------------

_FRESH = -2          # entry/exit state: no open bin (or an empty one)


def _greedy_geometry(nt: np.ndarray, budget: int):
    """Shared per-block geometry: exclusive prefix + the run-jump table
    ``jump[p] = end of the bin that starts fresh at doc p`` (largest
    j with exc[j] - exc[p] <= budget, clamped to p+1 so an oversized
    document forms a singleton bin)."""
    n = len(nt)
    exc = np.concatenate([[0], np.cumsum(nt, dtype=np.int64)])
    j0 = np.maximum(
        np.searchsorted(exc, exc[:n] + budget, side="right") - 1,
        np.arange(n) + 1)
    jump = np.append(j0, n).astype(np.int64)
    return exc, jump


def _greedy_chain(exc, jump, starts, budget):
    """Vectorized run-chain walk by binary lifting: from each fresh
    start position, (bins closed inside the block, exit state). The
    final open run carries unless it is an oversized singleton, which
    closes immediately (nothing can ever join it)."""
    n = len(jump) - 1
    starts = np.asarray(starts, np.int64)
    closes = np.zeros(len(starts), np.int64)
    exit_ = np.full(len(starts), _FRESH, np.int64)
    if n == 0:
        return closes, exit_
    levels = [jump]
    while (1 << len(levels)) <= n:
        prev = levels[-1]
        levels.append(prev[prev])
    cur = starts.copy()
    cnt = np.zeros(len(starts), np.int64)
    for k in range(len(levels) - 1, -1, -1):
        nxt = levels[k][cur]
        ok = nxt < n
        cur[ok] = nxt[ok]
        cnt[ok] += np.int64(1) << k
    live = starts < n
    s_last = exc[n] - exc[cur]               # final run's token total
    over = live & (s_last > budget)          # oversized singleton
    closes[live] = cnt[live] + over[live]
    exit_[live & ~over] = budget - s_last[live & ~over]
    return closes, exit_


def pack_greedy_bins(ds, budget: int = 512, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Greedy first-fit packing in ``id_col`` order: documents fill the
    current bin while they fit (``used + n_tokens <= budget``); a
    non-fitting document CLOSES the bin and opens the next; an
    oversized document (> budget) takes a bin alone, which closes
    immediately. Zero-token documents join the current bin. → one row
    per document: (id, n_tokens, bin_id), bin ids dense from 0.

    This recurrence is sequential over the whole corpus, but its state
    is FINITE — the open bin's remaining capacity (0..budget) or
    "fresh" — so it distributes as a function-composition scan:

    1. sort + materialize the narrow (id, n_tokens) projection (the
       same one exchange as pack_token_budget);
    2. each block computes, fully vectorized (one searchsorted for all
       entry states + a binary-lifting run-chain walk), its TRANSFER
       TABLE: entry state → (bins closed inside the block, exit
       state) — O((budget + block_rows) · log block_rows);
    3. the driver folds the per-block tables in id order — O(blocks ·
       budget) tiny ints — and broadcasts each block's (entry state,
       first bin id); function composition is associative, so a tree
       reduction drops in if block counts ever outgrow the driver;
    4. a second whole-block pass labels documents: entry-bin docs take
       the entry bin id, then a per-RUN walk (loop over bins, not
       rows) numbers the rest.
    """
    import ray

    mat = token_counts_narrow(ds, text_col, id_col).sort(id_col) \
        .materialize()

    def summary(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "__min": pa.array([], pa.int64()),
            "__max": pa.array([], pa.int64()),
            "fresh_closes": pa.array([], pa.int64()),
            "fresh_exit": pa.array([], pa.int64()),
            "closes": pa.array([], pa.list_(pa.int64())),
            "exit": pa.array([], pa.list_(pa.int64()))})
        if t.num_rows == 0:                  # sort can emit empty blocks
            return empty
        nt = np.asarray(t["n_tokens"], np.int64)
        n = len(nt)
        exc, jump = _greedy_geometry(nt, budget)
        f_closes, f_exit = _greedy_chain(exc, jump, [0], budget)
        # entry state r = remaining capacity of the carried-in open bin:
        # docs 0..b1-1 join it (zero-size docs extend a full bin, same
        # as the chain rule), then it closes and a fresh chain runs
        r = np.arange(budget + 1, dtype=np.int64)
        b1 = np.searchsorted(exc, r, side="right") - 1
        closes = np.zeros(budget + 1, np.int64)
        exit_ = np.empty(budget + 1, np.int64)
        through = b1 >= n                    # whole block joins the bin
        closes[through] = 0
        exit_[through] = r[through] - exc[n]
        rest = ~through
        c2, e2 = _greedy_chain(exc, jump, b1[rest], budget)
        closes[rest] = 1 + c2
        exit_[rest] = e2
        ids = t[id_col]
        return pa.table({
            "__min": [pc.min(ids).as_py()],
            "__max": [pc.max(ids).as_py()],
            "fresh_closes": pa.array([int(f_closes[0])], pa.int64()),
            "fresh_exit": pa.array([int(f_exit[0])], pa.int64()),
            "closes": pa.array([closes.tolist()], pa.list_(pa.int64())),
            "exit": pa.array([exit_.tolist()], pa.list_(pa.int64()))})

    parts = (mat.map_batches(summary, batch_format="pyarrow",
                             batch_size=None)
             .to_pandas())
    parts = parts[parts["__min"].notna()].sort_values("__min")
    entry: dict = {}
    state, bin_idx = _FRESH, 0
    for mn, mx, fc, fe, cl, ex in zip(
            parts["__min"], parts["__max"], parts["fresh_closes"],
            parts["fresh_exit"], parts["closes"], parts["exit"]):
        entry[(mn, mx)] = (state, bin_idx)
        if state == _FRESH:
            bin_idx += int(fc)
            state = int(fe)
        else:
            bin_idx += int(cl[state])
            state = int(ex[state])
    entry_ref = ray.put(entry)

    def label(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([t.schema.field(id_col),
                                pa.field("n_tokens", pa.int64()),
                                pa.field("bin_id", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        ids = t[id_col]
        e, base = ray.get(entry_ref)[(pc.min(ids).as_py(),
                                      pc.max(ids).as_py())]
        nt = np.asarray(t["n_tokens"], np.int64)
        n = len(nt)
        exc, jump = _greedy_geometry(nt, budget)
        bins = np.empty(n, np.int64)
        if e == _FRESH:
            p, cur = 0, base
        else:
            b1 = int(np.searchsorted(exc, e, side="right") - 1)
            bins[:b1] = base
            if b1 >= n:
                return pa.table({id_col: ids,
                                 "n_tokens": pa.array(nt),
                                 "bin_id": pa.array(bins)})
            p, cur = b1, base + 1
        while p < n:                         # loop over BINS, not rows
            q = int(jump[p])
            bins[p:q] = cur
            cur += 1
            p = q
        return pa.table({id_col: ids, "n_tokens": pa.array(nt),
                         "bin_id": pa.array(bins)})

    return mat.map_batches(label, batch_format="pyarrow",
                           batch_size=None)


_SHUFFLE_MULT = 2654435761                  # Knuth multiplicative constant


def shuffled_order(ds, id_col: str = "doc_id"):
    """Seeded deterministic global shuffle for training-data ordering:
    rank documents by ``(id * 2654435761) mod 2^32`` — a bijection on
    32-bit ids (odd multiplier), so keys are collision-free and the
    order is a pure function of the id: reruns, resumes and the SQL
    oracle (``row_number() OVER (ORDER BY same-expression)``) all agree.
    One narrow (id, key) sort + the block-prefix rank attach; the
    payload columns never move — consumers join the rank back or read
    via take ordering."""
    import ray

    def key(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64).astype(np.uint64)
        h = (ids * np.uint64(_SHUFFLE_MULT)) % np.uint64(1 << 32)
        return pa.table({id_col: t[id_col],
                         "shuffle_key": pa.array(h.astype(np.int64))})

    mat = ds.map_batches(key, batch_format="pyarrow") \
        .sort("shuffle_key").materialize()
    prefix = _block_exclusive_prefix(mat, "shuffle_key", None)
    pref_ref = ray.put(prefix)

    def attach(t: pa.Table) -> pa.Table:
        k = t["shuffle_key"]
        if t.num_rows == 0:     # empty sort block: no prefix entry
            return t.append_column("shuffle_rank",
                                   pa.array([], pa.int64()))
        base = ray.get(pref_ref)[(pc.min(k).as_py(), pc.max(k).as_py())]
        rank = base + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column("shuffle_rank", pa.array(rank, pa.int64()))

    return mat.map_batches(attach, batch_format="pyarrow",
                           batch_size=None)
