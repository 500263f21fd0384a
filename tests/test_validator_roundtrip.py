"""Generator↔validator round-trip property tests (reference pattern:
`tests/test_dates.py:64-69` — generate seeded samples per category, assert
the validator accepts them; misc classes never validate, mirrored from the
reference's xfail bookkeeping)."""

import datetime
import random

import numpy as np
import pytest

from cartwright_ray.detectors.registry import (
    DATE_FORMATS, DAYS_A, DAYS_a, MONTHS_B, MONTHS_b, MISC_LABELS,
    REGISTRY, DetectorContext, TIMESPAN_FORMATS,
)
from cartwright_ray.detectors.cascade import classify_series
from cartwright_ray.resources import COUNTRIES, CITIES

CTX = DetectorContext()
BY_LABEL = {d.label: d for d in REGISTRY}

N = 200
rng = random.Random(0)


def _random_dt(r):
    return datetime.datetime(1901, 1, 1) + datetime.timedelta(
        seconds=r.randrange(0, 4_000_000_000))


@pytest.mark.parametrize("fmt", DATE_FORMATS)
def test_date_format_roundtrip(fmt):
    r = random.Random(hash(fmt) & 0xFFFF)
    samples = [_random_dt(r).strftime(fmt) for _ in range(N)]
    det = BY_LABEL[fmt]
    assert det.count_fn(samples, CTX) == N


@pytest.mark.parametrize("fmt,sep,part", TIMESPAN_FORMATS)
def test_timespan_roundtrip(fmt, sep, part):
    r = random.Random(hash(fmt) & 0xFFFF)
    if part == "year":
        gen = lambda: f"{r.randrange(1701, 2199)}{sep}{r.randrange(1701, 2199)}"
    else:
        gen = lambda: (_random_dt(r).strftime(part) + sep
                       + _random_dt(r).strftime(part))
    samples = [gen() for _ in range(N)]
    det = BY_LABEL[fmt]
    assert det.count_fn(samples, CTX) == N


def test_partial_roundtrip():
    r = random.Random(3)
    assert BY_LABEL["%Y"].count_fn(
        [str(r.randrange(1701, 2199)) for _ in range(N)], CTX) == N
    assert BY_LABEL["%m"].count_fn(
        [f"{r.randrange(1, 13):02d}" for _ in range(N)], CTX) == N
    assert BY_LABEL["%d"].count_fn(
        [str(r.randrange(1, 32)) for _ in range(N)], CTX) == N
    assert BY_LABEL["%B"].count_fn(
        [r.choice(MONTHS_B).title() for _ in range(N)], CTX) == N
    assert BY_LABEL["%b"].count_fn(
        [r.choice(MONTHS_b) for _ in range(N)], CTX) == N
    assert BY_LABEL["%A"].count_fn(
        [r.choice(DAYS_A).title() for _ in range(N)], CTX) == N
    assert BY_LABEL["%a"].count_fn(
        [r.choice(DAYS_a) for _ in range(N)], CTX) == N


def test_unix_time_roundtrip():
    r = random.Random(4)
    samples = [str(r.randrange(100_000_000, 4_000_000_000)) for _ in range(N)]
    assert BY_LABEL["unix_time"].count_fn(samples, CTX) == N
    # the surrogate gate rejects small ints (row ids)
    assert BY_LABEL["unix_time"].count_fn(["1", "42", "1999"], CTX) == 0


def test_geo_roundtrip():
    r = random.Random(5)
    lat = [f"{r.uniform(-90, 90):.6f}" for _ in range(N)]
    lon = [f"{r.uniform(-180, 180):.6f}" for _ in range(N)]
    pair = [f"{a}, {b}" for a, b in zip(lat, lon)]
    assert BY_LABEL["latitude"].count_fn(lat, CTX) == N
    assert BY_LABEL["longitude"].count_fn(lon, CTX) == N
    assert BY_LABEL["latlong"].count_fn(pair, CTX) == N
    # hard-fail on out-of-range values
    assert BY_LABEL["latitude"].count_fn(lat + ["95.123456"], CTX) == 0

    iso2 = [c[1] for c in COUNTRIES]
    iso3 = [c[2] for c in COUNTRIES]
    assert BY_LABEL["ISO2"].count_fn(iso2, CTX) == len(iso2)
    assert BY_LABEL["ISO3"].count_fn(iso3, CTX) == len(iso3)
    conts = ["Africa", "Asia", "Europe", "Oceania", "Antarctica",
             "North America", "South America", "EU", "AS"]
    assert BY_LABEL["continent"].count_fn(conts, CTX) == len(conts)

    cities = [CITIES[r.randrange(len(CITIES))] for _ in range(50)]
    assert BY_LABEL["city"].count_fn(cities, CTX) == 50
    countries = [COUNTRIES[r.randrange(len(COUNTRIES))][0] for _ in range(50)]
    assert BY_LABEL["country_name"].count_fn(countries, CTX) == 50


@pytest.mark.parametrize("label", MISC_LABELS)
def test_misc_never_validates(label):
    assert BY_LABEL[label].count_fn(["anything", "at", "all"], CTX) == 0


def test_cascade_priority_date_before_unix():
    """Packed dates like 19760605 must classify as %Y%m%d, not unix_time."""
    r = random.Random(6)
    samples = [_random_dt(r).strftime("%Y%m%d") for _ in range(N)]
    res = classify_series(samples)
    assert res["format"] == "%Y%m%d"


def test_cascade_mdy_priority_over_dmy():
    samples = ["01-02-1999", "03-04-2000", "05-06-2001"]
    assert classify_series(samples)["format"] == "%m-%d-%Y"
    # day > 12 forces dmy
    samples = ["13-02-1999", "25-04-2000", "05-06-2001"]
    assert classify_series(samples)["format"] == "%d-%m-%Y"
