"""Header-based fuzzy classification (driver-side, tiny metadata op).

Keyword tables reproduced verbatim from
`/root/reference/cartwright/utils.py:195-241`; skip-match semantics from
`categorize.py:330-352` (ratio > 90 → column skips value classification and
gets a fuzzy geo result) and enrich-match from `categorize.py:287-328`
(ratio > 85 → attach fuzzyColumn); final fuzzyCategory → (category,
subcategory) mapping from `categorize.py:354-418`.
"""

from __future__ import annotations

from ..text.fuzz import fuzzy_ratio

# header → subcategory, match also SKIPS value classification (utils.py:195-204)
SKIP_KEYWORDS = [
    ("Lat", "latitude"),
    ("Latitude", "latitude"),
    ("lng", "latitude"),      # sic — the reference maps lng → latitude
    ("lon", "longitude"),
    ("long", "longitude"),
    ("Longitude", "longitude"),
    ("ISO2", "ISO2"),
    ("ISO3", "ISO3"),
]

# header → FuzzyCategory (utils.py:205-241)
CLASSIFY_KEYWORDS = [
    "Date", "Datetime", "Timestamp", "Epoch", "Time", "Year", "Month",
    "Lat", "Latitude", "lng", "lon", "long", "Longitude", "Geo",
    "Coordinates", "Location", "West", "South", "East", "North", "Country",
    "CountryName", "CC", "CountryCode", "State", "City", "Town", "Region",
    "Province", "Territory", "Address", "ISO2", "ISO3", "ISO_code",
    "Results",
]
# the value recorded for a matched key (utils.py:205-241 maps Lat/lng→Latitude,
# lon/long→Longitude, everything else to itself)
CLASSIFY_VALUE = {"Lat": "Latitude", "lng": "Latitude", "lon": "Longitude",
                  "long": "Longitude"}

# fuzzyCategory → (category, subcategory) for columns the value cascade left
# unclassified (categorize.py:366-402)
FUZZY_TIME = {"Year", "Date", "Datetime", "Timestamp", "Epoch", "Time", "Month"}
FUZZY_GEO_NONE = {"Geo", "Coordinates", "Location", "Address"}
FUZZY_COUNTRY = {"Country", "CountryName", "CountryCode"}
FUZZY_GEO_LOWER = {"State", "Town", "City", "Region", "Province", "Territory"}


def skip_matches(columns: list[str]) -> tuple[list[int], list[dict]]:
    """Reference ``skip_matched_columns`` (`categorize.py:330-352`)."""
    skip_idx: list[int] = []
    matched: list[dict] = []
    for i, header in enumerate(columns):
        for key, value in SKIP_KEYWORDS:
            r = fuzzy_ratio(str(header), key)
            if r > 90:
                skip_idx.append(i)
                matched.append({"index": i, "header": header, "key": key,
                                "value": value, "ratio": r})
    return skip_idx, matched


def fuzzy_column(header: str) -> dict | None:
    """Reference ``fuzzy_match_columns`` per-column core
    (`categorize.py:287-328`): best key with lowercased ratio > 85."""
    best = None
    for key in CLASSIFY_KEYWORDS:
        r = fuzzy_ratio(str(header), key)
        if r > 85 and (best is None or r > best["ratio"]):
            best = {"matchedKey": key,
                    "fuzzyCategory": CLASSIFY_VALUE.get(key, key),
                    "ratio": r}
    return best


def apply_fuzzy_fallback(category, subcategory, fuzzy_col: dict | None):
    """fuzzyCategory → (category, subcategory) when the value cascade gave
    None (`categorize.py:363-403`)."""
    if category is not None or fuzzy_col is None:
        return category, subcategory
    fc = fuzzy_col["fuzzyCategory"]
    if fc in FUZZY_TIME:
        return "time", "date"
    if fc in FUZZY_GEO_NONE:
        return "geo", None
    if fc in FUZZY_COUNTRY:
        return "geo", "country"
    if fc in FUZZY_GEO_LOWER:
        return "geo", fc.lower()
    return category, subcategory
