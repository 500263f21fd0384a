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
