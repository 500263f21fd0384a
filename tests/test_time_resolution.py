"""Time-resolution matrix (FIXTURES.md F4 — reference recipe
`tests/test_time_resolution_detection.py:39-52`: seed 0, 200 rows, cumsum of
unit + jitter none/±0.4%/±10%). Millisecond×PERFECT xfails exactly as the
reference marks it (float precision at epoch scale,
`test_time_resolution_detection.py:33-35`)."""

import numpy as np
import pytest

from cartwright_ray.analysis.time_resolution import (
    convert_to_timestamps, detect_temporal_resolution)
from cartwright_ray.detectors.schemas import TimeUnit, Uniformity

CASES = [(u, j, e) for u in TimeUnit
         for j, e in [(0.0, Uniformity.PERFECT),
                      (0.004, Uniformity.UNIFORM),
                      (0.1, Uniformity.NOT_UNIFORM)]]


@pytest.mark.parametrize("unit,jitter,expected", CASES)
def test_matrix(unit, jitter, expected):
    if unit == TimeUnit.millisecond and expected == Uniformity.PERFECT:
        pytest.xfail("millisecond precision — xfail mirrored from reference")
    np.random.seed(0)
    n = 200
    deltas = np.full(n, unit.value)
    if jitter:
        deltas = deltas + np.random.uniform(-jitter, jitter, n) * unit.value
    times = np.cumsum(deltas) + 1.7e9
    r = detect_temporal_resolution(times)
    assert r is not None
    assert r.unit == unit
    assert r.uniformity == expected
    assert abs(r.resolution - 1.0) < 0.2


def test_too_few_points():
    assert detect_temporal_resolution(np.array([1.0])) is None
    assert detect_temporal_resolution(np.array([5.0, 5.0])) is None


def test_convert_to_timestamps():
    out = convert_to_timestamps(
        ["2019-01-01 00:00:00", "2019-01-01 00:00:02"], "%Y-%m-%d %H:%M:%S")
    assert out.tolist() == [1546300800.0, 1546300802.0]


def test_duplicates_ignored():
    times = np.repeat(np.arange(0, 864000, 86400), 3) + 1.6e9
    r = detect_temporal_resolution(times)
    assert r.unit == TimeUnit.day
    assert r.uniformity == Uniformity.PERFECT
