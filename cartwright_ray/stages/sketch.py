"""Mergeable sketches over Ray Data — HyperLogLog approximate distinct.

The canonical mergeable-sketch shape: each block reduces to a tiny
fixed-size register array (vectorized numpy — hash, bucket, leading-zero
rank, ``np.maximum.at``), partials merge by elementwise max (associative
and commutative, so block order and parallelism are irrelevant), and
only ``2^p`` bytes per block ever leave the node. At 100 TB the driver
reduces ``num_blocks`` register rows — never ids.

Implements the standard HyperLogLog estimator (Flajolet et al., 2007)
with the small-range linear-counting correction. Determinism: the hash
is ``pd.util.hash_array`` with a fixed key, so reruns and merges give
bit-identical registers.

No SQL oracle exists for the estimate (DuckDB's approx_count_distinct
uses a different sketch), so correctness evidence is property-based:
relative error bounds on planted cardinalities and merge associativity
(tests/test_sampling_kmeans.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _registers(values: np.ndarray, p: int) -> np.ndarray:
    """2^p max-rank registers for a value array (vectorized)."""
    m = 1 << p
    h = pd.util.hash_array(np.asarray(values, dtype=object),
                           hash_key="cartwright_hll0000"[:16])
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of `rest` + 1, via float64 exponent extraction
    # (exact for the top 53 bits; the padded tail keeps rank <= 64-p+1
    # well inside that window)
    nz = rest != 0
    exp = np.zeros(rest.shape[0], dtype=np.int64)
    exp[nz] = (np.frexp(rest[nz].astype(np.float64))[1])
    rank = (64 - exp) + 1
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, bucket, rank.astype(np.int8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = regs.shape[0]
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): ±1.04/sqrt(2^p) relative error
    (~1.6% at the default p=12, 4 KiB per partial)."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False)
        regs = _registers(vals, p)
        return pa.table({"regs": pa.array([regs.tolist()],
                                          pa.list_(pa.int8()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << p, dtype=np.int8)
    for r in rows:
        merged = np.maximum(merged, np.asarray(r["regs"], dtype=np.int8))
    return _estimate(merged)


def heavy_hitter_tokens(ds, col: str = "text", k: int = 10,
                        capacity: int = 256,
                        split_pattern: str = r"\s+") -> pa.Table:
    """Exact top-k tokens via a Misra-Gries sketch + exact recount — the
    bounded-memory, SHUFFLE-FREE scale path for corpus heavy hitters
    (``sampling.top_tokens`` pays a (token, partial) groupby exchange;
    this pays none and holds O(capacity) per block summary).

    Pass 1 (streaming): per block, exact ``value_counts`` compressed to
    a Misra-Gries summary of ``capacity`` counters (subtract the
    (capacity+1)-th largest count, drop non-positive) plus one sentinel
    row (token = null) carrying the block's total decrement. The driver
    sums the tiny summaries; any token whose true global count exceeds
    the summed decrement ``err`` is guaranteed to be a candidate
    (Misra & Gries 1982, "Finding repeated elements"; err here is the
    sum of per-block subtracted thresholds — the exact bound on any
    token's global undercount).

    Pass 2 (streaming): exact recount of the broadcast candidate set —
    per-block ``is_in`` + ``value_counts`` partials, summed on the
    driver. No shuffle in either pass.

    The result is EXACT and self-checking: if the k-th recounted count
    does not exceed ``err`` the guarantee fails loudly (raise
    ``capacity``) instead of returning a silently-approximate answer.
    Returns (token, n) by (n desc, token asc)."""
    import ray

    def mg_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.cast(t[col], pa.string()),
                                      split_pattern)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        tok = np.asarray(vc.field("values"), dtype=object)
        cnt = np.asarray(vc.field("counts"), dtype=np.int64)
        kth = 0
        if len(tok) > capacity:
            kth = int(np.partition(cnt, len(cnt) - capacity - 1)[
                len(cnt) - capacity - 1])
            keep = cnt > kth
            tok, cnt = tok[keep], cnt[keep] - kth
        # sentinel row carries the block's subtracted threshold: for any
        # token, true_block - est_block <= kth, so summed thresholds
        # bound the global undercount of EVERY token
        return pa.table({
            "token": pa.concat_arrays([pa.array(tok, pa.string()),
                                       pa.array([None], pa.string())]),
            "est": pa.concat_arrays([pa.array(cnt, pa.int64()),
                                     pa.array([kth], pa.int64())])})

    summary = ds.map_batches(mg_partial, batch_format="pyarrow") \
        .to_pandas()
    err = int(summary[summary["token"].isna()]["est"].sum())
    cand = summary.dropna(subset=["token"]).groupby("token")["est"].sum()
    cand_tokens = np.sort(cand.index.to_numpy(dtype=object))
    cand_ref = ray.put(pa.array(cand_tokens, pa.string()))

    def recount(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        toks = pc.split_pattern_regex(pc.cast(t[col], pa.string()),
                                      split_pattern)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.is_in(flat, value_set=cands))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = ds.map_batches(recount, batch_format="pyarrow").to_pandas()
    exact = parts.groupby("token")["n"].sum().reset_index()
    exact = exact.sort_values(["n", "token"],
                              ascending=[False, True]).head(k)
    # with err > 0, a SHORT candidate list is just as uncertifiable as a
    # weak k-th count: non-candidates may hold true counts up to err
    if err > 0 and (len(exact) < k or int(exact["n"].iloc[-1]) <= err):
        kth = int(exact["n"].iloc[-1]) if len(exact) else 0
        raise AssertionError(
            f"heavy_hitter_tokens not provably exact: kth count {kth} "
            f"(of {len(exact)} candidates) <= MG error bound {err}; "
            f"raise capacity (currently {capacity})")
    return pa.table({"token": pa.array(exact["token"], pa.string()),
                     "n": pa.array(exact["n"].to_numpy(np.int64))})
