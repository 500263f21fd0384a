"""Continent names and codes (public geography; role of
`/root/reference/cartwright/resources/continent_lookup.csv`)."""

CONTINENTS = [
    ("AF", "Africa"),
    ("NA", "North America"),
    ("OC", "Oceania"),
    ("AN", "Antarctica"),
    ("AS", "Asia"),
    ("EU", "Europe"),
    ("SA", "South America"),
]

CONTINENT_CODES = [c for c, _ in CONTINENTS]
CONTINENT_NAMES = [n for _, n in CONTINENTS]
