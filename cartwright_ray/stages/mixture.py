"""Training-mixture composition over a multi-source corpus: weighted
per-source downsampling (resample to target mixture proportions, the
DoReMi/data-mixing primitive) and hard per-source quotas (cap dominant
domains).

Both are deterministic functions of ``(id, source)`` via the same
Knuth-multiplicative hash the seeded global shuffle uses
(``stages/packing.py``), so reruns, resumes, the SQL oracle, and any
parallelism level produce the identical sample — no RNG state anywhere.

- :func:`mixture_sample` is SHUFFLE-FREE: a pure vectorized
  ``map_batches`` filter (``hash * den < num * 2^32`` in exact integer
  arithmetic), embarrassingly parallel at any scale.
- :func:`source_quota` needs a global per-source ranking, so it pays ONE
  narrow sort exchange keyed on the source column ((id, source, key)
  triples only — payloads never move) and ranks inside whole-block
  segment kernels (``partition.key_segments``); consumers semi-join the
  surviving ids back.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .packing import _SHUFFLE_MULT
from .partition import key_segments

_MOD = np.uint64(1 << 32)


def _id_hash(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 — bijective on 32-bit ids (odd
    multiplier), uniform enough for acceptance sampling, and exactly
    reproducible in SQL."""
    u = np.asarray(ids, dtype=np.int64).astype(np.uint64)
    return (u * np.uint64(_SHUFFLE_MULT)) % _MOD


def mixture_sample(ds, rates: dict, id_col: str = "doc_id",
                   source_col: str = "source",
                   default_rate: tuple[int, int] = (1, 1)):
    """Keep each row of source ``s`` with probability ``rates[s]`` —
    given as exact fractions ``(num, den)`` — by accepting rows whose id
    hash satisfies ``h * den < num * 2^32`` (integer math, no float
    thresholds). Sources absent from ``rates`` use ``default_rate``.

    Deterministic, shuffle-free, and independent of partitioning: the
    same document is kept or dropped regardless of cluster size."""
    items = sorted(rates.items())
    srcs = [s for s, _ in items]
    nums = np.array([n for _, (n, d) in items], dtype=np.uint64)
    dens = np.array([d for _, (n, d) in items], dtype=np.uint64)

    def keep(t: pa.Table) -> pa.Table:
        h = _id_hash(np.asarray(t[id_col]))
        src = t.column(source_col)
        ii = pc.index_in(src, value_set=pa.array(srcs))
        miss = np.asarray(pc.is_null(ii))
        safe = np.asarray(ii.fill_null(0), dtype=np.int64)
        num = np.where(miss, np.uint64(default_rate[0]), nums[safe])
        den = np.where(miss, np.uint64(default_rate[1]), dens[safe])
        mask = h * den < num * _MOD
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def source_quota(ds, cap: int, id_col: str = "doc_id",
                 source_col: str = "source"):
    """Keep at most ``cap`` rows per source: rank rows within each
    source by ``(id_hash, id)`` — a deterministic "random" order — and
    keep ranks below the cap. Returns (id, source, src_rank) for the
    survivors; ONE narrow sort exchange on exactly the source column
    (the segment key — never add secondary sort keys, Ray range
    boundaries compare full tuples and would split a source across
    blocks)."""
    def narrow(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col])
        return pa.table({id_col: t[id_col], source_col: t[source_col],
                         "__h": pa.array(_id_hash(ids).astype(np.int64))})

    def rank_kernel(t: pa.Table) -> pa.Table:
        src = np.asarray(t[source_col])
        h = np.asarray(t["__h"])
        ids = np.asarray(t[id_col])
        order = np.lexsort((ids, h, src))
        starts, seg = key_segments(src[order])
        rank = np.arange(len(order), dtype=np.int64) - starts[seg]
        keep = rank < cap
        out = t.take(pa.array(order[keep]))
        out = out.drop_columns(["__h"])
        return out.append_column("src_rank", pa.array(rank[keep], pa.int64()))

    return (ds.map_batches(narrow, batch_format="pyarrow")
              .sort(source_col)
              .map_batches(rank_kernel, batch_format="pyarrow",
                           batch_size=None))


TEMP_FP_DEN = np.uint64(1 << 20)


def temperature_mixture(ds, alpha: float = 0.5, id_col: str = "doc_id",
                        source_col: str = "source"):
    """Temperature-based mixture sampling (the multilingual α-sampling
    rule): keep source ``s`` at rate (n_min / n_s)^(1−α), so the
    smallest source survives whole and dominant sources downsample
    toward balance (α = 1 keeps everything, α → 0 equalizes).

    Rates quantize to EXACT 2²⁰-denominator fractions —
    ⌊2²⁰·(n_min/n_s)^(1−α)⌋ — computed from the per-source counts (one
    narrow groupby; the rate table is dimension-sized) and fed to the
    shuffle-free integer acceptance of :func:`mixture_sample`. With
    α = ½ the exponent is a plain sqrt, so the SQL replay shares every
    IEEE op (divide, sqrt, ×2²⁰ — an exact power-of-two scale, floor).

    Returns the sampled Dataset restricted to (id, source)."""
    from ray.data.aggregate import Count

    counts = (ds.groupby(source_col)
              .aggregate(Count(alias_name="n")).to_pandas())
    ns = counts.set_index(source_col)["n"].to_dict()
    n_ref = min(ns.values())
    import math

    rates = {}
    for s, n in ns.items():
        ratio = float(n_ref) / float(n)
        # α = ½ goes through sqrt explicitly: pow(x, 0.5) and sqrt(x)
        # are not guaranteed to round identically, and the oracle says
        # sqrt
        r = math.sqrt(ratio) if alpha == 0.5 else ratio ** (1.0 - alpha)
        rates[s] = (int(np.floor(float(TEMP_FP_DEN) * r)),
                    int(TEMP_FP_DEN))
    slim = ds.map_batches(
        lambda t: t.select([id_col, source_col]),
        batch_format="pyarrow")
    return mixture_sample(slim, rates, id_col=id_col,
                          source_col=source_col)
