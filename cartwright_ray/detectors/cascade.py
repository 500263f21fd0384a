"""Column-classification cascade — reference entry point 1 re-expressed as a
Ray Data pipeline (SURVEY.md §3.1).

Logical stages (mirroring `categorize.py:430-443`):

1. header skip scan (driver-side metadata op — `categorize.py:330-352`)
2. null scan + per-column sampling (ONE streaming ``map_batches`` pass over
   Arrow blocks producing per-block (column, samples, non-null count)
   partials — replaces the whole-table pandas sampling at
   `categorize.py:113-124`)
3. validator cascade on the merged samples (deterministic priority order —
   replaces LSTM ranking + validator walk, `categorize.py:201-285`)
4. header fuzzy enrich + finalize (`categorize.py:287-418`)

The per-block sample partials are tiny (ncols × k strings), so the merge on
the driver is O(columns), never O(rows) — the only full-data pass is the
streaming sample/count scan. At 100 TB the scan is the cost; everything
after is metadata-sized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .headers import apply_fuzzy_fallback, fuzzy_column, skip_matches
from .registry import REGISTRY, DetectorContext
from .schemas import Classification, Classifications, FuzzyColumn

DEFAULT_NUM_SAMPLES = 100   # categorize.py:63 (99 drawn)


def _timeout_result() -> dict:
    # categorize.py:34-37 — kept for API parity; the engine has no wall-clock
    # cutoff (bounded candidate list instead, SURVEY.md §4.2).
    return {"category": "timeout", "subcategory": None, "format": None,
            "match_type": [], "Parser": None}


def _none_result() -> dict:
    return {"category": None, "subcategory": None, "format": None,
            "match_type": [], "Parser": None}


def classify_series(samples, ctx: DetectorContext | None = None) -> dict:
    """Run the deterministic validator cascade over string samples of one
    column; first detector meeting its threshold wins
    (`categorize.py:225-237`, `CategoryBases.py:95-100`)."""
    samples = [str(s) for s in samples]
    if not samples:
        return _none_result()
    ctx = ctx or _default_ctx()
    n = len(samples)
    for det in REGISTRY:
        if det.kind == "misc":
            continue
        try:
            valid = det.count_fn(samples, ctx)
        except Exception:
            valid = 0
        if valid >= n * det.threshold:
            return dict(det.result())
    return _none_result()


_CTX = None


def _default_ctx() -> DetectorContext:
    global _CTX
    if _CTX is None:
        _CTX = DetectorContext()
    return _CTX


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def _priority(column: str, value: str, occ: int, seed: int) -> int:
    """Deterministic pseudo-random priority for distributed reservoir
    sampling: global top-k by priority ~= a seeded uniform sample,
    mergeable across blocks without coordination.

    The salt is CONTENT-ONLY plus the value's per-block occurrence index
    (ADVICE r01): a value's priority never depends on its absolute position
    in a block, so the merged top-k is independent of block boundaries for
    distinct values; repeated values differ only in their occurrence
    indices (which keeps frequent values from flooding the sample with one
    shared priority while staying position-free)."""
    h = hashlib.blake2b(
        f"{column}\x00{value}\x00{occ}\x00{seed}".encode("utf-8", "replace"),
        digest_size=8)
    return int.from_bytes(h.digest(), "big")


def sample_block(table: pa.Table, k: int, seed: int = 42,
                 max_candidates: int = 4096) -> dict:
    """Per-block partial: for every column, up to k (priority, value) pairs
    from non-null values plus the non-null count. Output is a tiny
    single-row-per-column Arrow-able dict.

    Scale bound: only ``max_candidates`` seeded positional candidates per
    (column, block) are stringified — per-block Python work is O(k), not
    O(rows); the count uses the Arrow null bitmap. Candidate → final
    selection is the content-priority reservoir (partitioning-independent
    among candidates)."""
    import numpy as np
    cols, counts, prios, vals = [], [], [], []
    n_rows = table.num_rows
    for name in table.column_names:
        arr = table.column(name)
        valid = arr.drop_null()
        count = len(valid)
        if count > max_candidates:
            rng = np.random.default_rng(
                (seed << 16) ^ (zlib_crc(name) & 0xFFFF) ^ count)
            pos = np.sort(rng.choice(count, size=max_candidates,
                                     replace=False))
            valid = valid.take(pa.array(pos))
        # stringify like the reference (str() at categorize.py:122)
        svals = [str(v) for v in valid.to_pylist()]
        occ: dict[str, int] = {}
        pairs = []
        for v in svals:
            o = occ.get(v, 0)
            occ[v] = o + 1
            pairs.append((_priority(name, v, o, seed), v))
        pairs.sort(reverse=True)
        pairs = pairs[:k]
        cols.append(name)
        counts.append(count)
        prios.append([p for p, _ in pairs])
        vals.append([v for _, v in pairs])
    return {"column": cols, "count": counts, "prios": prios, "values": vals}


def zlib_crc(s: str) -> int:
    import zlib
    return zlib.crc32(s.encode())


def merge_samples(partials, k: int) -> dict[str, tuple[list[str], int]]:
    """Merge per-block partials → {column: (top-k samples, non-null count)}.

    Identical (priority, value) pairs from different blocks are DEDUPED:
    a value's per-block occurrence index restarts at 0, so its first
    occurrence in every block carries the same priority — without the
    dedupe the merged top-k over-represents repeated values by one entry
    per block they appear in (ADVICE r02). Residual approximation,
    documented: occurrences beyond the first per block share indices
    across blocks, so a value repeated R times over B blocks contributes
    min-ish(R, ceil(R/B)·…) ≤ R distinct priorities — repeated values can
    be *under*-sampled relative to true multiset sampling, never
    over-represented, and the result stays block-boundary independent
    for distinct values."""
    merged: dict[str, set] = {}
    counts: dict[str, int] = {}
    for part in partials:
        for col, cnt, ps, vs in zip(part["column"], part["count"],
                                    part["prios"], part["values"]):
            merged.setdefault(col, set()).update(zip(ps, vs))
            counts[col] = counts.get(col, 0) + int(cnt)
    out = {}
    for col, pairs in merged.items():
        spairs = sorted(pairs, reverse=True)
        out[col] = ([v for _, v in spairs[:k]], counts[col])
    return out


# ---------------------------------------------------------------------------
# full classification flows
# ---------------------------------------------------------------------------

def _finalize(columns: list[str], results: dict[str, dict]) -> Classifications:
    """Header fuzzy enrich + fuzzy-category fallback + schema objects
    (`categorize.py:287-418`)."""
    out = []
    for col in columns:
        res = results[col]
        fc = fuzzy_column(col)
        match_type = list(res.get("match_type") or [])
        if fc is not None:
            match_type.append("fuzzy")
        match_type = sorted({m for m in match_type if m})
        category, subcategory = apply_fuzzy_fallback(
            res.get("category"), res.get("subcategory"), fc)
        out.append(Classification(
            column=col,
            category=category,
            subcategory=subcategory,
            format=res.get("format"),
            match_type=match_type,
            Parser=res.get("Parser"),
            fuzzyColumn=FuzzyColumn(**fc) if fc else None,
        ))
    return Classifications(classifications=out)


def _classify_sampled(columns, sampled, ctx=None,
                      seconds_to_finish: float | None = None) -> Classifications:
    """Shared tail of classify_table / classify_dataset.

    ``sampled``: {column: (samples, non_null_count)}.

    ``seconds_to_finish``: optional wall-clock budget mirroring the
    reference (`categorize.py:63,213`): columns not reached before it
    expires are labelled ``timeout``. Default None — the engine prefers a
    bounded candidate list over wall-clock cutoffs (SURVEY.md §4.2), the
    parameter exists for API parity.
    """
    import time as _time
    t0 = _time.perf_counter()
    skip_idx, skip_matched = skip_matches(columns)
    skip_set = set(skip_idx)
    results: dict[str, dict] = {}
    for i, col in enumerate(columns):
        samples, count = sampled.get(col, ([], 0))
        if (seconds_to_finish is not None and i not in skip_set
                and _time.perf_counter() - t0 > seconds_to_finish):
            results[col] = _timeout_result()
            continue
        if i in skip_set:
            # skipped(): fuzzy geo result from the header match
            # (categorize.py:40-58)
            res = _none_result()
            for m in skip_matched:
                if m["header"] == col:
                    res = {"category": "geo", "subcategory": m["value"],
                           "format": None, "match_type": ["fuzzy"],
                           "Parser": None}
            results[col] = res
        elif count == 0:
            # all-null columns are skipped with no classification
            # (find_NANs, categorize.py:420-428)
            results[col] = _none_result()
        else:
            results[col] = classify_series(samples, ctx)
    return _finalize(columns, results)


def classify_table(table: pa.Table, num_samples: int = DEFAULT_NUM_SAMPLES,
                   seed: int = 42,
                   seconds_to_finish: float | None = None) -> Classifications:
    """Local (single-block) classification — fixtures/tests and small frames.
    Equivalent of ``CartwrightClassify.columns_classified(df=...)``."""
    k = max(1, num_samples - 1)
    part = sample_block(table, k, seed)
    sampled = merge_samples([part], k)
    return _classify_sampled(table.column_names, sampled,
                             seconds_to_finish=seconds_to_finish)


def classify_dataset(ds, num_samples: int = DEFAULT_NUM_SAMPLES,
                     seed: int = 42) -> Classifications:
    """Distributed classification of a ``ray.data.Dataset``.

    One streaming ``map_batches`` pass emits tiny per-block sample/count
    partials; the driver merges them (O(columns)) and runs the cascade.
    Never materializes the dataset.
    """
    k = max(1, num_samples - 1)
    columns = ds.schema().names

    def _partial(batch: pa.Table) -> pa.Table:
        d = sample_block(batch, k, seed)
        return pa.table({
            "column": pa.array(d["column"], pa.string()),
            "count": pa.array(d["count"], pa.int64()),
            "prios": pa.array(d["prios"], pa.list_(pa.uint64())),
            "values": pa.array(d["values"], pa.list_(pa.string())),
        })

    partials_ds = ds.map_batches(_partial, batch_format="pyarrow")
    partials = []
    for b in partials_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        partials.append({
            "column": b["column"].to_pylist(),
            "count": b["count"].to_pylist(),
            "prios": b["prios"].to_pylist(),
            "values": b["values"].to_pylist(),
        })
    sampled = merge_samples(partials, k)
    return _classify_sampled(columns, sampled)


def categorize(classifications: Classifications) -> dict:
    """Reference ``categorize`` projection (`categorize.py:465-474`):
    {column: {category, subcategory, format}} for classified columns only."""
    out = {}
    for c in classifications.classifications:
        if c.category is not None:
            out[c.column] = {"category": c.category,
                             "subcategory": c.subcategory,
                             "format": c.format}
    return out


def columns_categorized(classifications: Classifications) -> dict:
    """Reference ``columns_categorized`` projection (`categorize.py:445-463`)
    including the placeholder time_resolution block."""
    out = {}
    for c in classifications.classifications:
        d = c.to_dict()
        out[c.column] = {
            "category": d["category"],
            "subcategory": d["subcategory"],
            "format": d["format"],
            "time_resolution": {"resolution": None, "unit": None,
                                "density": None, "error": None},
            "match_type": d["match_type"],
            "fuzzyColumn": d["fuzzyColumn"],
        }
    return out
