"""Deterministic detector registry — the semantic core of column inference.

Reproduces the reference's per-category validators exactly
(SURVEY.md §2.3; `/root/reference/cartwright/categories/*.py`,
`cartwright/CategoryBases.py:54-100`) but as a **deterministic priority
cascade**: the reference ranks candidates with a char-LSTM whose inference is
stochastic (`LSTM.py:24-31` re-randomizes hidden state per forward) and then
lets validators make the final accept/reject decision
(`categorize.py:225-237`). We drop the LSTM and evaluate validators
exhaustively in a fixed specific-before-general priority order — the
"deterministic fixed point" of the reference pipeline (SURVEY.md §5.3).

Deterministic LSTM-surrogate gates (documented deviations that replace the
LSTM's learned prior; each mirrors what the training data actually looked
like):
- ``year`` (`%Y`, threshold .99 per `partial_dates.py:9`) additionally
  requires 1700 < y < 2200 (the reference's own year sanity range,
  `CategoryBases.py:138-146`) so arbitrary 4-digit integers don't classify
  as years.
- ``latitude``/``longitude`` (`geos.py:143-157`) require decimal values with
  4-8 fractional digits (faker-style coordinates the LSTM was trained on,
  `geos.py:140-141`) and hard-fail if any parsed value exceeds the ±90/±180
  bound — so generic bounded floats / longitudes don't classify as latitude.
- ``unix_time`` (`dates.py:12-17`) additionally requires an 8-13 digit
  integer so row ids / small counts don't classify as epochs.
- ``city``/``country_name`` subsampling (`geos.py:18-34,72-88`) uses a
  seeded RNG keyed on the sample tuple instead of the reference's unseeded
  ``random.sample``.
- ``continent`` matches continent names/codes; the reference's loop
  iterates DataFrame *column names* (`geos.py:128-132` — a bug), we
  implement the documented intent (fuzzy ratio > 85 vs names/codes).

Validators run on ≤``number_of_samples`` string samples per column, so plain
Python loops here are not a hot path; the corpus-scale extraction stages
(``cartwright_ray.stages.extract``) use vectorized regexes instead.
"""

from __future__ import annotations

import datetime
import random
import re
from dataclasses import dataclass, field
from typing import Callable, Optional

from ..resources import (
    CITIES, CONTINENT_CODES, CONTINENT_NAMES, COUNTRY_NAMES, ISO2_CODES,
    ISO3_CODES, STATE_NAMES,
)
from ..text.fuzz import FuzzyLookup, fuzzy_ratio

DEFAULT_THRESHOLD = 0.85          # CategoryBases.py:51
PARTIAL_THRESHOLD = 0.99          # partial_dates.py:9,20,54
YEAR_MIN, YEAR_MAX = 1700, 2200   # CategoryBases.py:142
UNIX_MIN, UNIX_MAX = -5364601438, 4102506000  # dates.py:14

# Month/day word lists with the reference's nonstandard abbreviations
# (utils.py:166 "tues"/"thur", utils.py:190 "sept").
DAYS_A = ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"]
DAYS_a = ["mon", "tues", "wed", "thur", "fri", "sat", "sun"]
MONTHS_B = ["january", "february", "march", "april", "may", "june", "july",
            "august", "september", "october", "november", "december"]
MONTHS_b = ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sept",
            "oct", "nov", "dec"]

# The 46 full-date strftime formats, in the reference's definition order
# (dates.py:22-456): ymd ×9, mdy ×12, dmy ×12, %Y%d, ym ×4, iso8601,
# long ×7.
DATE_FORMATS = [
    "%Y-%m-%d", "%Y_%m_%d", "%Y/%m/%d", "%Y.%m.%d", "%Y%m%d",
    "%Y-%m-%d %H:%M:%S", "%Y/%m/%d %H:%M:%S", "%Y_%m_%d %H:%M:%S",
    "%Y.%m.%d %H:%M:%S",
    "%m-%d-%Y", "%m-%d-%y", "%m_%d_%Y", "%m_%d_%y", "%m/%d/%Y", "%m/%d/%y",
    "%m.%d.%Y", "%m.%d.%y", "%m-%d-%Y %H:%M:%S", "%m/%d/%Y %H:%M:%S",
    "%m_%d_%Y %H:%M:%S", "%m.%d.%Y %H:%M:%S",
    "%d-%m-%Y", "%d-%m-%y", "%d_%m_%Y", "%d_%m_%y", "%d/%m/%Y", "%d/%m/%y",
    "%d.%m.%Y", "%d.%m.%y", "%d-%m-%Y %H:%M:%S", "%d/%m/%Y %H:%M:%S",
    "%d_%m_%Y %H:%M:%S", "%d.%m.%Y %H:%M:%S",
    "%Y%d",
    "%Y-%m", "%Y/%m", "%Y.%m", "%Y_%m",
    "%Y-%m-%dT%H:%M:%S",
    "%A, %B %d, %Y", "%B %d, %Y", "%A, %B %d, %Y, %H:%M:%S",
    "%m/%d/%y %H:%M:%S %p", "%d %B %Y", "%a, %d %b %Y", "%d %B %y",
]

# Timespan formats and their split/parse rules (timespans.py:7-114).
TIMESPAN_FORMATS = [
    ("%Y-%Y", "-", "year"),
    ("%Y:%Y", ":", "year"),
    ("%B %d, %Y - %B %d, %Y", "-", "%B %d, %Y"),
    ("%d-%m-%Y:%d-%m-%Y", ":", "%d-%m-%Y"),
    ("%d/%m/%Y:%d/%m/%Y", ":", "%d/%m/%Y"),
    ("%d/%m/%Y-%d/%m/%Y", "-", "%d/%m/%Y"),
]

# Misc labels kept for registry/label parity — never validate
# (MiscBase.validate_series returns 0, CategoryBases.py:102-108).
MISC_LABELS = [
    "first_name", "percent", "ssn", "language_name", "country_name_misc",
    "phone_number", "zipcode", "paragraph", "pyfloat", "email", "prefix",
    "pystr", "boolean", "boolean_letter",
]

# LSTM-surrogate gates (see module docstring): coordinates must look like
# faker-style decimals (4-8 fractional digits); unix epochs must have >=8
# digits (the reference's own range already implies 1800-2100 era epochs).
_DECIMAL_COORD = re.compile(r"^[+-]?\d{1,3}\.\d{4,8}$")
_EPOCH = re.compile(r"^-?\d{8,13}$")


@dataclass
class DetectorContext:
    """Lookup state loaded once per detector actor (mirrors the
    class-static CSV loads at `CategoryBases.py:24-39`)."""
    city_lookup: FuzzyLookup = field(default_factory=lambda: FuzzyLookup(CITIES))
    country_lookup: FuzzyLookup = field(default_factory=lambda: FuzzyLookup(COUNTRY_NAMES))
    state_lookup: FuzzyLookup = field(default_factory=lambda: FuzzyLookup(STATE_NAMES))
    iso2: frozenset = ISO2_CODES
    iso3: frozenset = ISO3_CODES
    continents: tuple = tuple(CONTINENT_NAMES + CONTINENT_CODES)


def _strptime_ok(value: str, fmt: str) -> bool:
    try:
        datetime.datetime.strptime(value, fmt)
        return True
    except (ValueError, TypeError):
        return False


def _valid_year(part: str) -> bool:
    s = str(part).strip()
    return s.isdigit() and YEAR_MIN < int(s) < YEAR_MAX


def _count(series, pred) -> int:
    n = 0
    for v in series:
        try:
            if pred(str(v)):
                n += 1
        except Exception:
            pass
    return n


def _subsample_fuzzy(series, lookup: FuzzyLookup, need=2, subsample=5,
                     score=90) -> int:
    """Deterministic version of the reference's 2-of-5 random-subsample fuzzy
    membership test (`geos.py:18-34`): draw ``min(subsample, n)`` DISTINCT
    indices (like the reference's ``random.sample``) with a RNG seeded on
    the FULL series content, so the same column always classifies the same
    way and columns sharing only a prefix draw different samples
    (ADVICE r01)."""
    import hashlib
    vals = [str(v) for v in series]
    digest = hashlib.blake2b("\x00".join(vals).encode("utf-8", "replace"),
                             digest_size=8).digest()
    rng = random.Random(int.from_bytes(digest, "big"))
    n_draw = min(subsample, len(vals))
    idx = rng.sample(range(len(vals)), n_draw)
    passed = 0
    for i in idx:
        m = lookup.best(vals[i])
        if m is not None and m[1] > score:
            passed += 1
            if passed >= need:
                break
    return len(series) if passed >= min(need, n_draw) else 0


@dataclass
class Detector:
    label: str                     # registry label (format string or class name)
    kind: str                      # 'date' | 'timespan' | 'geo' | 'misc'
    count_fn: Callable             # (series, ctx) -> valid count
    threshold: float = DEFAULT_THRESHOLD
    subcategory: Optional[str] = None   # for geo results
    format: Optional[str] = None        # for date/timespan results

    def result(self) -> dict:
        """The accepted-classification dict, mirroring
        build_return_date_object / build_return_timespan /
        build_return_standard_object (utils.py:23-50)."""
        if self.kind == "date":
            return {"category": "time", "subcategory": "date",
                    "format": self.format, "match_type": ["LSTM"],
                    "Parser": "Util"}
        if self.kind == "timespan":
            return {"category": "time", "subcategory": "timespan",
                    "format": self.format, "match_type": ["LSTM"],
                    "Parser": None}
        return {"category": "geo", "subcategory": self.subcategory,
                "format": None, "match_type": ["LSTM"], "Parser": None}


def _date_detector(fmt: str) -> Detector:
    return Detector(
        label=fmt, kind="date", format=fmt,
        count_fn=lambda s, ctx, f=fmt: _count(s, lambda v: _strptime_ok(v, f)),
    )


def _timespan_detector(fmt: str, sep: str, part_fmt: str) -> Detector:
    if part_fmt == "year":
        def pred(v, sep=sep):
            parts = v.split(sep)
            return len(parts) > 1 and all(_valid_year(p) for p in parts)
    else:
        def pred(v, sep=sep, pf=part_fmt):
            parts = [p.strip() for p in v.split(sep)]
            return len(parts) > 1 and all(_strptime_ok(p, pf) for p in parts)
    return Detector(label=fmt, kind="timespan", format=fmt,
                    count_fn=lambda s, ctx, p=pred: _count(s, p))


def _coord_count(series, bound: float) -> int:
    """Latitude/longitude count with the decimal-pattern gate; any parsed
    value beyond the bound hard-fails the whole category (see module doc)."""
    n = 0
    for v in series:
        s = str(v).strip()
        if _DECIMAL_COORD.match(s):
            f = float(s)
            if abs(f) <= bound:
                n += 1
            else:
                return 0
    return n


def _latlong_count(series, ctx) -> int:
    def pred(v):
        parts = v.split(",")
        if len(parts) != 2:
            return False
        lat, lng = parts[0].strip(), parts[1].strip()
        return abs(float(lat)) <= 90 and abs(float(lng)) <= 180
    return _count(series, pred)


def _continent_count(series, ctx) -> int:
    def pred(v):
        return any(fuzzy_ratio(v, c) > 85 for c in ctx.continents)
    return _count(series, pred)


def build_registry() -> list[Detector]:
    """Full detector registry in cascade priority order
    (specific-before-general; SURVEY.md §7.4)."""
    reg: list[Detector] = []
    for fmt, sep, pf in TIMESPAN_FORMATS:
        reg.append(_timespan_detector(fmt, sep, pf))
    for fmt in DATE_FORMATS:
        reg.append(_date_detector(fmt))

    # partial dates (partial_dates.py:5-81)
    reg.append(Detector(
        label="%Y", kind="date", format="%Y", threshold=PARTIAL_THRESHOLD,
        count_fn=lambda s, ctx: _count(s, _valid_year)))
    reg.append(Detector(
        label="%m", kind="date", format="%m", threshold=PARTIAL_THRESHOLD,
        count_fn=lambda s, ctx: _count(s, lambda v: _strptime_ok(v, "%m"))))
    reg.append(Detector(
        label="%d", kind="date", format="%d", threshold=PARTIAL_THRESHOLD,
        count_fn=lambda s, ctx: _count(s, lambda v: _strptime_ok(v, "%d"))))
    reg.append(Detector(
        label="%B", kind="date", format="%B",
        count_fn=lambda s, ctx: _count(s, lambda v: v.lower() in MONTHS_B)))
    reg.append(Detector(
        label="%b", kind="date", format="%b",
        count_fn=lambda s, ctx: _count(s, lambda v: v.lower() in MONTHS_b)))
    reg.append(Detector(
        label="%A", kind="date", format="%A",
        count_fn=lambda s, ctx: _count(s, lambda v: v.lower() in DAYS_A)))
    reg.append(Detector(
        label="%a", kind="date", format="%a",
        count_fn=lambda s, ctx: _count(s, lambda v: v.lower() in DAYS_a)))

    # unix_time (dates.py:4-17) — after year/date formats so that 4-digit
    # years and packed dates don't fall into the epoch range.
    reg.append(Detector(
        label="unix_time", kind="date", format="unix_time",
        count_fn=lambda s, ctx: _count(
            s, lambda v: bool(_EPOCH.match(v)) and UNIX_MIN <= int(v) <= UNIX_MAX)))

    # geo (geos.py)
    reg.append(Detector(label="latlong", kind="geo", subcategory="latlong",
                        count_fn=_latlong_count))
    reg.append(Detector(label="latitude", kind="geo", subcategory="latitude",
                        count_fn=lambda s, ctx: _coord_count(s, 90.0)))
    reg.append(Detector(label="longitude", kind="geo", subcategory="longitude",
                        count_fn=lambda s, ctx: _coord_count(s, 180.0)))
    reg.append(Detector(
        label="ISO2", kind="geo", subcategory="ISO2",
        count_fn=lambda s, ctx: _count(s, lambda v: v.upper() in ctx.iso2)))
    reg.append(Detector(
        label="ISO3", kind="geo", subcategory="ISO3",
        count_fn=lambda s, ctx: _count(s, lambda v: v.upper() in ctx.iso3)))
    reg.append(Detector(label="continent", kind="geo", subcategory="continent",
                        count_fn=_continent_count))
    reg.append(Detector(
        label="country_name", kind="geo", subcategory="country_name",
        count_fn=lambda s, ctx: _subsample_fuzzy(s, ctx.country_lookup)))
    reg.append(Detector(
        label="state_name", kind="geo", subcategory="state_name",
        count_fn=lambda s, ctx: _subsample_fuzzy(s, ctx.state_lookup)))
    reg.append(Detector(
        label="city", kind="geo", subcategory="city",
        count_fn=lambda s, ctx: _subsample_fuzzy(s, ctx.city_lookup)))
    reg.append(Detector(
        label="city_suffix", kind="geo", subcategory="city",
        count_fn=lambda s, ctx: _subsample_fuzzy(s, ctx.city_lookup)))

    # misc labels — label-set parity only, never accepted
    for lab in MISC_LABELS:
        reg.append(Detector(label=lab, kind="misc",
                            count_fn=lambda s, ctx: 0))
    return reg


REGISTRY = build_registry()


def all_labels() -> list[str]:
    return [d.label for d in REGISTRY]


def register_detector(detector: Detector, priority_before: str | None = None):
    """User-extension surface (reference: add a class under
    ``cartwright/categories/`` and reflection picks it up,
    `category_helpers.py:8-29`; docs/categories.md). Here: construct a
    :class:`Detector` (label, kind, count_fn, threshold, subcategory/format)
    and register it, optionally before an existing label in cascade
    priority order."""
    if priority_before is None:
        REGISTRY.append(detector)
        return
    for i, d in enumerate(REGISTRY):
        if d.label == priority_before:
            REGISTRY.insert(i, detector)
            return
    raise KeyError(f"no detector labelled {priority_before!r}")


def unregister_detector(label: str):
    # mutate in place — other modules hold references to this list
    REGISTRY[:] = [d for d in REGISTRY if d.label != label]
