"""Distributed Gram matrix — XᵀX over an embedding column in integer
fixed point: the covariance/PCA building block (power iteration,
whitening and linear probes all start from this reduce).

Values quantize to ⌊x·2²⁰⌋ int64 FIRST (float32 → float64 is exact,
the ×2²⁰ product is one shared IEEE op, floor is exact), so every
per-block partial XᵀX is an exact int64 matmul and cross-block
summation is order-free — the DuckDB replay (parallel unnest +
vec_id self-join on d ≤ d') is bit-exact where a float Gram would
differ per block layout. int64 bound: |x|≤2 ⇒ products ≤ 2⁴², safe to
~2²¹ rows per key globally — beyond that widen to per-block Python-int
combine (the ``trend_by_key`` HUGEINT discipline).

Scale shape: one ``map_batches`` partial (a (64×64) matmul per block —
compute-bound, zero shuffle) → a (d², narrow) groupby sum. The output
is O(dim²), independent of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

FP_SCALE = float(1 << 20)


def gram_matrix(ds, emb_col: str = "embedding",
                dim: int = 64) -> pd.DataFrame:
    """→ pandas (i, j, g) upper triangle (1-based dims, i ≤ j) of the
    quantized Gram matrix, plus the row count folded in at (0, 0)."""
    from ray.data.aggregate import Sum

    iu, ju = np.triu_indices(dim)

    def partial(t: pa.Table) -> pa.Table:
        cc = t[emb_col].combine_chunks()
        if pa.types.is_list(cc.type) or pa.types.is_large_list(cc.type) \
                or pa.types.is_fixed_size_list(cc.type):
            arr = np.asarray(cc.flatten(), np.float64) \
                .reshape(-1, dim)
        else:                     # Ray tensor extension (pandas-born)
            arr = np.asarray(cc.to_numpy(zero_copy_only=False),
                             np.float64).reshape(-1, dim)
        xq = np.floor(arr * FP_SCALE).astype(np.int64)
        g = xq.T @ xq
        out = {"i": pa.array(np.r_[np.int64(0), iu + 1]),
               "j": pa.array(np.r_[np.int64(0), ju + 1]),
               "g": pa.array(np.r_[np.int64(len(xq)), g[iu, ju]])}
        return pa.table(out)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["i", "j"])
           .aggregate(Sum("g", alias_name="g"))
           .to_pandas())
    return out.sort_values(["i", "j"]).reset_index(drop=True)
