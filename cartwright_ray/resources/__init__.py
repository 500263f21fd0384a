"""Static lookup tables (engine-owned, derived from public ISO-3166 /
geography facts — NOT copied from the reference's packaged CSVs).

The reference loads four CSVs once per process as class statics
(`/root/reference/cartwright/CategoryBases.py:24-39`). Here the tables are
plain Python modules imported once per detector *actor* and shared via
``ray.put`` when a stage needs them broadcast.
"""

from .countries import COUNTRIES, COUNTRY_NAMES, ISO2_CODES, ISO3_CODES
from .continents import CONTINENTS, CONTINENT_NAMES, CONTINENT_CODES
from .states import STATES, STATE_NAMES
from .cities import CITIES

__all__ = [
    "COUNTRIES", "COUNTRY_NAMES", "ISO2_CODES", "ISO3_CODES",
    "CONTINENTS", "CONTINENT_NAMES", "CONTINENT_CODES",
    "STATES", "STATE_NAMES", "CITIES",
]
