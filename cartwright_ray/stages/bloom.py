"""Bloom-filter semi-join: the standard shuffle reducer for large-large
equi-joins at 100-TB scale.

A plain hash semi-join shuffles EVERY large-side row; when the small side
is too big to broadcast as an exact key set but its *Bloom bitmap* is not
(1.2 GB of keys -> ~12 MB of bits at 1% FPR), the right plan is:

1. build a Bloom filter over the small side's keys — per-block partial
   bitmaps (one fixed-size ``uint64`` word array each), OR-merged; the
   merge is associative/commutative, so partials need no coordination;
2. broadcast the merged bitmap once (``ray.put``) and pre-filter the
   large side with a vectorized probe inside ``map_batches`` — no
   shuffle touches the ~(1-FPR) of rows the filter rejects;
3. (exactness) run the narrow sort-exchange semi-join on the survivors
   only: union survivor rows with the small side's keys under a side
   marker, single-key sort, whole-block segment kernel keeps large rows
   whose key segment contains a small-side row.

No false negatives by construction (step 3 sees every true match);
step 3 removes the false positives, so the composite is EXACT while the
all-to-all only ever carries ``|matches| + FPR * |large|`` rows.

Hashing is two independent 64-bit siphash passes (``pd.util.hash_array``
with fixed 16-byte keys) combined by double hashing ``h1 + i*h2 (mod m)``
— the standard Kirsch-Mitzenmacher construction.

Reference scope note: jataware/cartwright has no join surface at all;
this operator exists for the engine's 100-TB training-data pipelines
(SURVEY.md §2.7 extension), same family as ``stages/dedup.py``'s
hash-partitioned plans.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

_KEY1 = "cartwright_blm00"
_KEY2 = "cartwright_blm01"


def bloom_params(expected_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(num_bits m, num_hashes k) for ``expected_keys`` at target ``fpr``.

    m = -n ln p / (ln 2)^2, k = (m/n) ln 2; m is rounded up to a whole
    number of 64-bit words so partial bitmaps align for the OR-merge.
    """
    n = max(int(expected_keys), 1)
    m = int(math.ceil(-n * math.log(fpr) / (math.log(2.0) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n * math.log(2.0))))
    return m, k


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: full-avalanche remix so the derived stream
    is bitwise independent of the source under any modulus (a plain
    ``h*c + d`` leaves the low bits affine in h — measured 3.5x the
    design FPR)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_pair(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hash streams over an object/int array."""
    arr = np.asarray(vals)
    if arr.dtype.kind not in ("O", "U", "S"):
        # hash_array on numeric dtypes ignores hash_key (it hashes the
        # bits); derive the second stream with a full-avalanche remix
        h1 = pd.util.hash_array(arr)
        return h1, _splitmix(h1 + np.uint64(0x9E3779B97F4A7C15))
    h1 = pd.util.hash_array(arr, hash_key=_KEY1)
    h2 = pd.util.hash_array(arr, hash_key=_KEY2)
    return h1, h2


def _set_bits(words: np.ndarray, keys: np.ndarray, m: int, k: int) -> None:
    h1, h2 = _hash_pair(keys)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _test_bits(words: np.ndarray, keys: np.ndarray, m: int,
               k: int) -> np.ndarray:
    h1, h2 = _hash_pair(keys)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        w = words[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return hit


def bloom_build(ds, key_col: str, expected_keys: int | None = None,
                fpr: float = 0.01) -> tuple[np.ndarray, int, int]:
    """Bloom bitmap over ``ds[key_col]``: per-block partial bitmaps,
    OR-merged on the driver (one m/8-byte buffer per block; the merge is
    a single ``np.bitwise_or`` per partial — tree-reduce it via
    ``ray.remote`` if block count × bitmap size ever outgrows the driver,
    the operation is associative).

    Returns ``(words, m, k)`` where words is the ``uint64[m/64]`` bitmap.
    """
    if expected_keys is None:
        expected_keys = int(ds.count())
    m, k = bloom_params(expected_keys, fpr)

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(m // 64, dtype=np.uint64)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        _set_bits(words, keys, m, k)
        # one row per block: the bitmap as fixed-width binary
        return pa.table({"bm": pa.array([words.tobytes()], pa.binary())})

    words = np.zeros(m // 64, dtype=np.uint64)
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for buf in b["bm"]:
            words |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return words, m, k


def bloom_filter_ds(ds, key_col: str, words: np.ndarray, m: int, k: int):
    """Streaming pre-filter: keep rows whose key MAY be in the filter
    (no false negatives). The bitmap ships once via ``ray.put``."""
    import ray

    ref = ray.put(words)

    def probe(t: pa.Table) -> pa.Table:
        w = ray.get(ref)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_test_bits(w, keys, m, k)))

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_semi_join(large_ds, small_ds, large_key: str, small_key: str,
                    fpr: float = 0.01, rows_per_block: int = 65536):
    """EXACT semi-join of ``large_ds`` against ``small_ds``'s keys with a
    Bloom pre-filter bounding the shuffled volume to
    ``|matches| + fpr * |large|`` rows (see module docstring).

    Keys must be integer or string typed; output is the large side's rows
    (all columns) whose key appears in the small side.
    """
    # the small side is scanned three times (count, bitmap build, key
    # union) — pin it in the object store once
    small_ds = small_ds.materialize()
    words, m, k = bloom_build(small_ds, small_key, fpr=fpr)
    survivors = bloom_filter_ds(large_ds, large_key, words, m, k)

    from .partition import arrow_schema_of
    l_schema = arrow_schema_of(large_ds)

    def mark_large(t: pa.Table) -> pa.Table:
        t = t.append_column("__bsj_key", t.column(large_key))
        return t.append_column(
            "__bsj_side", pa.array(np.zeros(t.num_rows, np.int8)))

    def mark_small(t: pa.Table) -> pa.Table:
        cols = [pa.nulls(t.num_rows, fld.type) for fld in l_schema]
        out = pa.Table.from_arrays(cols, schema=l_schema)
        out = out.append_column("__bsj_key", t.column(small_key))
        return out.append_column(
            "__bsj_side", pa.array(np.ones(t.num_rows, np.int8)))

    both = (survivors.map_batches(mark_large, batch_format="pyarrow")
            .union(small_ds.select_columns([small_key])
                   .map_batches(mark_small, batch_format="pyarrow")))

    # coalesce tiny exchanges (quadratic shuffle-object dispatch — same
    # guard as knn_join_shuffle); big inputs keep natural partitioning
    est = int(small_ds.count())
    if est < 32_000_000:
        nblk = int(np.clip((2 * est + rows_per_block - 1) // rows_per_block,
                           4, 1024))
        both = both.repartition(nblk)

    out_schema = l_schema

    def keep_matches(t: pa.Table) -> pa.Table:
        # whole-block kernel over the single-key sort exchange: a key
        # segment with >= 1 small-side row keeps its large-side rows
        if t.num_rows == 0:
            return out_schema.empty_table()
        key = t.column("__bsj_key").to_numpy(zero_copy_only=False)
        side = np.asarray(t["__bsj_side"])
        change = np.r_[True, key[1:] != key[:-1]]
        seg = np.cumsum(change) - 1
        has_small = np.zeros(seg[-1] + 1, dtype=bool)
        np.logical_or.at(has_small, seg, side == 1)
        keep = has_small[seg] & (side == 0)
        return (t.filter(pa.array(keep))
                .drop_columns(["__bsj_key", "__bsj_side"]))

    return (both.sort("__bsj_key")
            .map_batches(keep_matches, batch_format="pyarrow",
                         batch_size=None))
