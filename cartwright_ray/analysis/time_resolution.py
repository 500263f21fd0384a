"""Temporal-resolution detection — reference entry point 2
(`/root/reference/cartwright/analysis/time_resolution.py:8-66`), plus the
Ray Data wrapper that computes it over a Dataset column without
materializing the data (SURVEY.md §3.2).

Scale note: the driver-side kernel runs on the **distinct** timestamp set,
which for resolution-detectable data (regular time grids) is bounded by the
grid size, not the row count. The distinct set is produced by a Ray
``unique`` (hash shuffle) over a single projected int64 column.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Optional

import numpy as np
import pyarrow as pa

from ..detectors.schemas import Resolution, TimeUnit
from .helpers import get_uniformity, match_unit


def detect_temporal_resolution(times: np.ndarray) -> Optional[Resolution]:
    """Median inter-timestamp delta matched to the TimeUnit ontology
    (`time_resolution.py:8-39`): unique → sort → adjacent diffs → median;
    uniformity of deltas; unit = argmin relative error; resolution =
    median/unit; error = mean|δ-med|/unit."""
    times = np.unique(np.asarray(times, dtype=np.float64))
    if times.size < 2:
        return None
    deltas = times[1:] - times[:-1]
    avg = np.median(deltas)
    uniformity = get_uniformity(deltas, avg)
    scale, unit = match_unit(TimeUnit, avg)
    error = float(np.abs(deltas - avg).mean() / unit.value)
    return Resolution(uniformity, unit, float(scale), error)


def convert_to_timestamps(times, fmt: str) -> np.ndarray:
    """Strings → UTC epoch seconds (`time_resolution.py:43-66`)."""
    return np.array([
        datetime.strptime(str(t), fmt).replace(tzinfo=timezone.utc).timestamp()
        for t in times
    ])


def _strings_to_seconds(col: pa.Array, fmt: str) -> pa.Array:
    """Vectorized strptime → int64 epoch seconds (Arrow kernel, assumes
    UTC like the reference's replace(tzinfo=utc)); falls back to the
    per-value reference parser for formats Arrow can't handle."""
    import pyarrow.compute as pc
    try:
        parsed = pc.strptime(pc.cast(col, pa.string()), format=fmt, unit="s")
        return pc.cast(parsed, pa.int64())
    except pa.ArrowInvalid:
        return pa.array(
            convert_to_timestamps(col.to_pylist(), fmt).astype("int64"))


def date_util_span(dates) -> list[dict]:
    """Reference ``date_util_span`` (`cartwright/utils.py:53-59`): parse
    each value with dateutil (dayfirst=False) → [{value, standard}]."""
    import dateutil.parser
    out = []
    for d in dates:
        parsed = dateutil.parser.parse(str(d), dayfirst=False)
        out.append({"value": d, "standard": parsed})
    return out


def detect_temporal_resolution_by_key(ds, key: str, column: str,
                                      fmt: str | None = None):
    """Per-key resolution (SURVEY.md §2.6 A4 'per-key' case): dedup
    (key, second) pairs with a grouped combiner, then one ``map_groups``
    running the small kernel per key. Returns a Dataset of
    (key, uniformity, unit, resolution, error)."""
    import pandas as pd
    import pyarrow.compute as pc

    ds = ds.select_columns([key, column])

    def to_seconds(t: pa.Table) -> pa.Table:
        col = t.column(column)
        if pa.types.is_timestamp(col.type):
            secs = pc.cast(pc.floor_temporal(col, unit="second"),
                           pa.timestamp(col.type.unit)).cast(pa.int64())
            div = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}
            secs = pc.divide(secs, div[col.type.unit])
        elif fmt is not None:
            secs = _strings_to_seconds(col, fmt)
        else:
            secs = col.cast(pa.int64())
        out = pa.table({key: t.column(key), "ts_s": secs})
        # per-block combiner: drop duplicate (key, second) pairs before the
        # shuffle
        return out.group_by([key, "ts_s"]).aggregate([])

    dedup = ds.map_batches(to_seconds, batch_format="pyarrow") \
              .groupby([key, "ts_s"]).count()

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        r = detect_temporal_resolution(g["ts_s"].to_numpy(dtype=np.int64))
        if r is None:
            return pd.DataFrame({key: [], "uniformity": [], "unit": [],
                                 "resolution": [], "error": []})
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "uniformity": [r.uniformity.name],
                             "unit": [r.unit.name],
                             "resolution": [r.resolution],
                             "error": [r.error]})

    return dedup.groupby(key).map_groups(per_key, batch_format="pandas")


def detect_temporal_resolution_ds(ds, column: str,
                                  fmt: str | None = None) -> Optional[Resolution]:
    """Distributed wrapper: project one column, convert to epoch seconds in
    a streaming ``map_batches``, take the distinct set (shuffle), run the
    small kernel driver-side.

    ``fmt=None`` expects the column to already be a timestamp/numeric type.
    """
    ds = ds.select_columns([column])

    def to_seconds(t: pa.Table) -> pa.Table:
        col = t.column(column)
        if pa.types.is_timestamp(col.type):
            import pyarrow.compute as pc
            # floor to whole seconds (a plain cast refuses to truncate)
            secs = pc.cast(pc.floor_temporal(col, unit="second"),
                           pa.timestamp(col.type.unit)).cast(pa.int64())
            div = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}
            secs = pc.divide(secs, div[col.type.unit])
        elif fmt is not None:
            secs = _strings_to_seconds(col, fmt)
        else:
            secs = col.cast(pa.int64())
        return pa.table({"ts_s": secs})

    ds = ds.map_batches(to_seconds, batch_format="pyarrow")
    distinct = ds.unique("ts_s")
    return detect_temporal_resolution(np.array(distinct, dtype=np.int64))
