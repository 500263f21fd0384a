"""Result-schema vocabulary — mirrors the reference's pydantic/enum surface
(`/root/reference/cartwright/schemas.py`) with stdlib dataclasses/enums
(pydantic-free; results serialize cleanly into Arrow struct columns).

The enum *vocabularies* are reproduced exactly (fixture matching):
Category/Subcategory/Matchtype/Parser/FuzzyCategory per `schemas.py:6-94`,
Uniformity per `schemas.py:97-108`, AngleUnit/TimeUnit with the exact float
values per `schemas.py:115-132` (note month = year/12, decade = 10y+2d,
century = 100y+24d, millennium = 1000y+242d).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from enum import Enum
from typing import List, Optional


class Category(str, Enum):
    geo = "geo"
    time = "time"
    boolean = "boolean"
    timeout = "timeout"


class Subcategory(str, Enum):
    city_name = "city_name"
    state_name = "state_name"
    country_name = "country_name"
    ISO3 = "ISO3"
    ISO2 = "ISO2"
    continent = "continent"
    longitude = "longitude"
    latitude = "latitude"
    date = "date"
    timespan = "timespan"
    country = "country"
    state = "state"
    city = "city"
    town = "town"
    region = "region"
    province = "province"
    territory = "territory"


class Matchtype(str, Enum):
    fuzzy = "fuzzy"
    LSTM = "LSTM"


class Parser(str, Enum):
    Util = "Util"
    arrow = "arrow"


# 30 header keywords the fuzzy column matcher looks for (`schemas.py:6-40`).
FUZZY_CATEGORIES = [
    "Date", "Datetime", "Timestamp", "Epoch", "Time", "Year", "Month",
    "Latitude", "Longitude", "Geo", "Coordinates", "Location", "West",
    "South", "East", "North", "Country", "CountryName", "CC", "CountryCode",
    "State", "City", "Town", "Region", "Province", "Territory", "Address",
    "ISO2", "ISO3", "ISO_code", "Results",
]
FuzzyCategory = Enum("FuzzyCategory", {k: k for k in FUZZY_CATEGORIES}, type=str)


class Uniformity(Enum):
    PERFECT = 1
    UNIFORM = 2
    NOT_UNIFORM = 3

    def description(self) -> str:
        return {
            Uniformity.PERFECT: "perfectly uniform",
            Uniformity.UNIFORM: "uniform to within 1%",
            Uniformity.NOT_UNIFORM: "not uniform",
        }[self]


class Unit(float, Enum):
    """Base for float-valued unit enums (`schemas.py:111-112`)."""


class AngleUnit(Unit):
    degrees = 1.0
    minutes = 1.0 / 60
    seconds = 1.0 / 3600


class TimeUnit(Unit):
    millisecond = 1e-3
    second = 1.0
    minute = 60.0
    hour = 3600.0
    day = 86400.0
    week = 7 * 86400.0
    year = 365 * 86400.0
    month = 365 * 86400.0 / 12
    decade = 10 * 365 * 86400.0 + 2 * 86400.0
    century = 100 * 365 * 86400.0 + 24 * 86400.0
    millennium = 1000 * 365 * 86400.0 + 242 * 86400.0


@dataclass
class Resolution:
    """Mirror of `schemas.py:135-140`."""
    uniformity: Uniformity
    unit: Unit
    resolution: float
    error: float

    def to_dict(self) -> dict:
        return {
            "uniformity": self.uniformity.name,
            "unit": self.unit.name,
            "resolution": float(self.resolution),
            "error": float(self.error),
        }


@dataclass
class GeoSpatialResolution:
    """Mirror of `schemas.py:143-147`."""
    lat: Optional[Resolution] = None
    lon: Optional[Resolution] = None
    square: Optional[Resolution] = None


@dataclass
class FuzzyColumn:
    """Mirror of `schemas.py:81-87`."""
    matchedKey: str
    fuzzyCategory: Optional[str]
    ratio: int


@dataclass
class Classification:
    """Mirror of `schemas.py:150-160` — one column's classification."""
    column: str
    category: Optional[str] = None
    subcategory: Optional[str] = None
    format: Optional[str] = None
    match_type: List[str] = field(default_factory=list)
    Parser: Optional[str] = None
    fuzzyColumn: Optional[FuzzyColumn] = None

    def to_dict(self) -> dict:
        d = asdict(self)
        return d


@dataclass
class Classifications:
    classifications: List[Classification]

    def to_dict(self) -> dict:
        return {"classifications": [c.to_dict() for c in self.classifications]}
