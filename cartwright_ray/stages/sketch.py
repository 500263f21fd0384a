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


# ---------------------------------------------------------------------------
# per-key HyperLogLog with an INTEGER estimator — the oracle-replayable
# variant. `hll_distinct` above is the production shape (64-bit hash,
# float estimator, global count); this one trades hash width for exact
# replayability: every step — the double-Lehmer hash, the bucket/rank
# split, the register max-merge, and the estimate itself (fixed-point
# rational raw estimator + a shared integer-floored linear-counting
# table) — is integer arithmetic a SQL engine reproduces bit-exactly.
# ---------------------------------------------------------------------------

_LEHMER_M = 2147483647                      # 2^31 - 1 (prime)
_LEHMER_A = 48271                           # MINSTD multiplier


def lehmer2(v: np.ndarray) -> np.ndarray:
    """31-bit double-step Lehmer hash of int64 values, SQL-replayable as
    ``((v+1)*48271 % 2147483647) * 48271 % 2147483647`` (the +1 keeps
    value 0 out of the generator's fixed point)."""
    x = (np.asarray(v, np.int64) + 1) * _LEHMER_A % _LEHMER_M
    return x * _LEHMER_A % _LEHMER_M


def lc_floor_table(m: int) -> list[int]:
    """Integer-floored linear-counting estimates ``floor(m*ln(m/V))``
    for V = 1..m. Embedded VERBATIM in the SQL oracle (the literal is
    generated from this function), so both engines index the same
    table instead of each calling their own libm ``ln``."""
    import math
    return [math.floor(m * math.log(m / v)) for v in range(1, m + 1)]


def hll_distinct_by_key(ds, key_col: str, val_col: str, p: int = 8):
    """Approximate COUNT(DISTINCT ``val_col``) per ``key_col`` → one row
    (key, est) per key, ``est`` an int64 from the integer estimator:

    - hash: :func:`lehmer2` (31 bits); bucket = h % m, w = h // m
      (Q = 31-p residual bits); rank rho = Q+1 - bitlen(w), w=0 → Q+1;
    - registers: max rho per (key, bucket), absent bucket = 0;
    - raw = (7213·m · m² · 2^(Q+1)) // ((10000·m + 10790) · sum_pow)
      with sum_pow = Σ_b 2^(Q+1 - reg_b) — the standard
      alpha_m·m²/Σ2^-reg estimator scaled to one integer division
      (alpha_m = 0.7213/(1 + 1.079/m) held as an exact rational);
    - linear counting when any register is empty and 2·raw ≤ 5·m:
      est = lc_floor_table(m)[V-1] for V empty registers.

    Distribution: per-block partials merge each block's rows into dense
    per-key registers (one ``np.maximum.at``) and emit only the nonzero
    (key, bucket, rho) triples — ≤ m·keys tiny rows per block; ONE sort
    exchange on the key alone co-locates them and a whole-block kernel
    max-merges and estimates, vectorized across every key in the block.
    At extreme block counts the exchange carries m rows per key per
    block; registers merge associatively, so an intermediate combine
    stage drops in unchanged if that narrow exchange ever dominates.
    """
    from .partition import key_segments

    m = 1 << p
    q1 = 31 - p + 1                          # rank ceiling (w = 0 case)
    alpha_num = 7213 * m
    alpha_den = 10000 * m + 10790
    raw_num = alpha_num * m * m * (1 << q1)
    lc = np.asarray(lc_floor_table(m), np.int64)
    part_schema = pa.schema([pa.field(key_col, pa.string()),
                             pa.field("bucket", pa.int64()),
                             pa.field("rho", pa.int64())])
    out_schema = pa.schema([pa.field(key_col, pa.string()),
                            pa.field("est", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        h = lehmer2(np.asarray(t[val_col], np.int64))
        bucket = h % m
        w = h // m
        bl = np.zeros(len(w), np.int64)
        nz = w > 0
        bl[nz] = np.frexp(w[nz].astype(np.float64))[1]  # exact bitlen
        rho = q1 - bl
        codes, uniq = pd.factorize(t[key_col].to_pandas())
        regs = np.zeros(len(uniq) * m, np.int64)
        np.maximum.at(regs, codes * m + bucket, rho)
        keep = np.flatnonzero(regs)
        return pa.table({key_col: pa.array(uniq[keep // m], pa.string()),
                         "bucket": pa.array(keep % m),
                         "rho": pa.array(regs[keep])})

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = np.asarray(t[key_col], dtype=object)
        starts, seg = key_segments(keys)
        regs = np.zeros(len(starts) * m, np.int64)
        np.maximum.at(regs, seg * m + np.asarray(t["bucket"], np.int64),
                      np.asarray(t["rho"], np.int64))
        regs = regs.reshape(len(starts), m)
        sum_pow = np.left_shift(np.int64(1), q1 - regs).sum(axis=1)
        v_zero = (regs == 0).sum(axis=1).astype(np.int64)
        raw = raw_num // (alpha_den * sum_pow)
        lc_est = lc[np.maximum(v_zero, 1) - 1]
        est = np.where((v_zero > 0) & (2 * raw <= 5 * m), lc_est, raw)
        return pa.table({key_col: pa.array(keys[starts], pa.string()),
                         "est": pa.array(est)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.sort(key_col).map_batches(finalize,
                                           batch_format="pyarrow",
                                           batch_size=None)


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


_CMS_SALT = 1_000_003


def cms_counts(ds, col: str, query_values, rows: int = 4,
               width: int = 1024):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) point estimates
    for ``query_values`` over the int64 column ``col``.

    The mergeable-sketch shape again: each block reduces to a
    ``rows × width`` int64 count table (one ``np.add.at`` per hash
    row), partials merge by elementwise SUM — associative, so the
    groupby on (row, bucket) carries at most ``rows·width`` rows per
    block regardless of input size; the final sketch is O(rows·width)
    on the driver and answers each query with a min over ``rows``
    bucket counts. Estimates are upper bounds (est ≥ true) with
    ε ≈ e/width overcount at confidence 1 − e^−rows.

    Row hashes are the SQL-replayable double-Lehmer ramp:
    ``bucket_r(v) = lehmer2(v + r·1000003) mod width`` — the DuckDB
    oracle recomputes the identical integers.

    → pandas (value, est) sorted by value."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col], np.int64)
        out_r, out_b, out_c = [], [], []
        for r in range(rows):
            b = lehmer2(v + r * _CMS_SALT) % width
            counts = np.bincount(b, minlength=width)
            nz = np.flatnonzero(counts)
            out_r.append(np.full(len(nz), r, np.int64))
            out_b.append(nz.astype(np.int64))
            out_c.append(counts[nz].astype(np.int64))
        return pa.table({"r": pa.array(np.concatenate(out_r)),
                         "b": pa.array(np.concatenate(out_b)),
                         "cnt": pa.array(np.concatenate(out_c))})

    sk = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["r", "b"])
          .aggregate(Sum("cnt", alias_name="cnt"))
          .to_pandas())
    table = np.zeros((rows, width), np.int64)
    table[sk["r"].to_numpy(), sk["b"].to_numpy()] = sk["cnt"].to_numpy()
    q = np.asarray(list(query_values), np.int64)
    ests = np.full(len(q), np.iinfo(np.int64).max, np.int64)
    for r in range(rows):
        ests = np.minimum(ests, table[r, lehmer2(q + r * _CMS_SALT)
                                      % width])
    out = pd.DataFrame({"value": q, "est": ests})
    return out.sort_values("value").reset_index(drop=True)
