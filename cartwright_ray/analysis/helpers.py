"""Uniformity / unit-matching kernels — semantics of
`/root/reference/cartwright/analysis/helpers.py:7-25` (pure numpy)."""

from __future__ import annotations

import numpy as np

from ..detectors.schemas import Uniformity


def get_uniformity(vals: np.ndarray, avg: float) -> Uniformity:
    """PERFECT if every |v-avg| < 1e-9*|avg|; UNIFORM if max < 1%*|avg|;
    else NOT_UNIFORM (`helpers.py:7-15`)."""
    score = np.abs(vals - avg)
    mag = np.abs(avg)
    if np.all(score < 1e-9 * mag):
        return Uniformity.PERFECT
    if score.max() < 0.01 * mag:
        return Uniformity.UNIFORM
    return Uniformity.NOT_UNIFORM


def match_unit(unit_cls, avg: float):
    """Closest unit by relative error; returns (scale, unit)
    (`helpers.py:18-25`)."""
    names = list(unit_cls.__members__.keys())
    durations = np.array([unit_cls[n].value for n in names], dtype=float)
    errors = np.abs(durations - avg) / durations
    i = int(np.argmin(errors))
    return avg / durations[i], unit_cls[names[i]]
