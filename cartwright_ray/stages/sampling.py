"""Deterministic distributed sampling operators.

A 100-TB training-data pipeline needs samples that are (a) reproducible
across runs and cluster sizes, (b) computable without coordination, and
(c) auditable by an independent engine. Random-number sampling fails all
three; these operators instead derive the sampling decision from a pure
integer hash of the row id, so ANY engine (the DuckDB oracles replay the
identical arithmetic in SQL) selects the identical rows.

The hash is a Lehmer / Park–Miller MCG step ``h(id) = id * 48271 mod
(2^31 - 1)`` — multiplier and modulus from the public minimal-standard
generator (Park & Miller, CACM 1988). It stays below 2^63 for ids up to
~1.9e14, so the same expression evaluates exactly in int64 SQL engines —
the reason it is preferred here over a wider mixer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .partition import hash_partitioned, key_segments

_LEHMER_MULT = 48271
_LEHMER_MOD = 2_147_483_647  # 2^31 - 1 (prime)


def lehmer_hash(ids: np.ndarray) -> np.ndarray:
    """Vectorized TWO-round MCG step
    ``h = ((id * 48271 mod m) * 48271) mod m`` with ``m = 2^31-1``.

    One round is not enough: for dense small ids (id < m/48271 ≈ 44k)
    ``id * 48271`` never wraps, so a threshold cut selects a contiguous
    id prefix instead of a sample. The second round's effective
    multiplier wraps from id ≈ 12 upward. Both rounds stay int64-exact
    (first for ids < 1.9e14 — checked — second because the inner value
    is < 2^31), so int64 SQL engines replay the hash bit-for-bit.
    """
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size and int(ids.max(initial=0)) > (2**63 - 1) // _LEHMER_MULT:
        raise ValueError("id range would overflow the int64 Lehmer step")
    h = (ids * _LEHMER_MULT) % _LEHMER_MOD
    return (h * _LEHMER_MULT) % _LEHMER_MOD


def hash_sample(ds, id_col: str, frac: float):
    """Deterministic uniform row sample: keep rows whose Lehmer hash
    falls below ``frac`` of the modulus.

    Embarrassingly parallel — a stateless vectorized filter per batch,
    no shuffle, no RNG state, identical output at any parallelism. The
    cut ``h < floor(frac * (2^31-1))`` is integer-exact, so the DuckDB
    oracle reproduces it bit-for-bit.
    """
    cut = int(frac * _LEHMER_MOD)

    def pick(t: pa.Table) -> pa.Table:
        h = lehmer_hash(np.asarray(pc.cast(t[id_col], pa.int64())))
        return t.filter(pa.array(h < cut))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_topk_sample(ds, key_col: str, id_col: str, k: int,
                           num_partitions: int | None = None,
                           small_limit: int = 262_144):
    """Per-key deterministic sample: for every distinct ``key_col``
    value, the ``k`` rows with the smallest ``(lehmer_hash(id), id)`` —
    a uniform-without-replacement sample whose membership is a pure
    function of the ids, reproducible by the SQL oracle with
    ``row_number() OVER (PARTITION BY key ORDER BY h, id)``.

    Scale shape: a vectorized per-BLOCK top-k first (rank arithmetic
    over key segments — no Python per key), so the shuffle carries at
    most ``k × keys_per_block`` candidate rows per block instead of the
    full table; then one hash repartition co-locates each key's
    candidates and the same kernel selects the global winners.
    """

    def topk_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = np.asarray(pc.cast(t[id_col], pa.int64()))
        h = lehmer_hash(ids)
        # block-local dictionary codes: the kernel only needs rows of
        # equal keys adjacent after the sort, not a global key order
        keys = np.asarray(
            pc.dictionary_encode(t[key_col]).combine_chunks().indices)
        # sort by (key, h, id); rank-within-key via segment arithmetic
        order = np.lexsort((ids, h, keys))
        starts, seg = key_segments(keys[order])
        rank = np.arange(order.size) - starts[seg]
        kept = order[rank < k]
        out = t.take(pa.array(np.sort(kept)))
        hh = lehmer_hash(np.asarray(pc.cast(out[id_col], pa.int64())))
        return out.append_column("h", pa.array(hh, pa.int64())) \
            if "h" not in out.column_names else out

    # candidates are at most k x keys_per_block x blocks rows — pin them
    # (the count below and the exchange both scan) and take the
    # tiny-exchange fast path when they fit one block: the kernel only
    # needs every key's rows co-located, which ONE coalesced block
    # trivially satisfies, skipping the hash-shuffle aggregator spin-up
    # (~1-2s fixed, dominated this operator at benchmark scale)
    candidates = ds.map_batches(topk_block,
                                batch_format="pyarrow").materialize()
    if candidates.count() <= small_limit:   # small_limit=0 forces hash plan
        return candidates.repartition(1).map_batches(
            topk_block, batch_format="pyarrow", batch_size=None)
    parted = hash_partitioned(candidates, [key_col], num_partitions)
    if parted is None:
        return candidates  # empty input
    # blocks are key-sorted with complete keys; same kernel finalizes
    return parted.map_batches(topk_block, batch_format="pyarrow",
                              batch_size=None)


def sequential_poisson_sample(ds, k: int, weight_col: str,
                              id_col: str = "doc_id"):
    """Weighted (probability-proportional-to-size) sample of ``k`` rows
    — sequential Poisson sampling (Ohlsson 1998, the PPS scheme used in
    survey estimation): each row gets priority ``xi = u / w`` with
    ``u = (lehmer_hash(id) + 0.5) / (2^31 - 1)`` and weight ``w``; the
    ``k`` smallest priorities win, so heavier rows are
    proportionally likelier to be picked, deterministically.

    ``xi`` is built ONLY from IEEE-exact operations (integer hash, two
    correctly-rounded divisions), so any engine computes bit-identical
    priorities — the DuckDB oracle replays the selection exactly,
    unlike log/exp-based Efraimidis–Sampling keys whose transcendental
    libm calls differ across engines.

    Scale shape (same as k-means seeding): each block keeps only its
    local ``k`` smallest (``np.argpartition``), the driver merges the
    ``k × num_blocks`` narrow partials and keeps the global ``k``.
    Rows with non-positive weight are excluded (undefined priority).

    → the selected input rows + ``xi``, sorted by ``id_col``.
    """

    def block_topk(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t[id_col], pa.int64()))
        w = np.asarray(pc.cast(t[weight_col], pa.float64()))
        u = (lehmer_hash(ids) + 0.5) / _LEHMER_MOD
        xi = u / w
        ok = np.flatnonzero(w > 0)
        if len(ok) > k:
            ok = ok[np.argpartition(xi[ok], k)[:k]]
        t = t.take(pa.array(ok, pa.int64()))
        return t.append_column("xi", pa.array(xi[ok], pa.float64()))

    import ray
    import ray.data

    refs = (ds.map_batches(block_topk, batch_format="pyarrow",
                           zero_copy_batch=True)
              .materialize().to_arrow_refs())   # ≤ k × num_blocks rows
    parts = pa.concat_tables([t.combine_chunks()
                              for t in ray.get(refs)])
    xi = np.asarray(parts["xi"])
    ids = np.asarray(pc.cast(parts[id_col], pa.int64()))
    order = np.lexsort((ids, xi))[:k]           # global k smallest xi
    win = parts.take(pa.array(
        order[np.argsort(ids[order])], pa.int64()))
    return ray.data.from_arrow(win)


def top_tokens(ds, col: str = "text", k: int = 50,
               split_pattern: str = r"\s+"):
    """Corpus-wide heavy hitters: the ``k`` most frequent whitespace
    tokens with counts, ties broken by token string.

    Scale shape: tokens are exploded AND pre-aggregated inside each
    batch (Arrow ``split_pattern_regex`` + ``value_counts`` — one C
    pass), so the groupby shuffle carries ``(token, partial_count)``
    rows bounded by per-block vocabulary, not corpus token count; a
    native sum merges partials and only the k winners leave the sort.
    """
    from ray.data.aggregate import Sum

    def partial_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.cast(t[col], pa.string()), split_pattern)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = (ds.map_batches(partial_counts, batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("n", alias_name="n")))
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)
