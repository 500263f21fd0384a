"""Conformance corpus (FIXTURES.md F2 / SURVEY.md §5.2.1): classification
over the reference's example CSVs must match the deterministic
validator-cascade fixed point exactly (category, subcategory, format).

Expectations derive from the reference's validators + our documented
LSTM-surrogate gates (cartwright_ray/detectors/registry.py docstring); the
`lng → latitude` mapping replicates the reference's own skip-table
(`cartwright/utils.py:197` maps lng to latitude).
"""

import pandas as pd
import pyarrow as pa
import pytest

from cartwright_ray.detectors.cascade import classify_table, categorize

REF = "/root/reference"

EXPECTED = {
    f"{REF}/examples/example_1.csv": {
        "latitude": ("geo", "latitude", None),
        "longitude": ("geo", "longitude", None),
        "date": ("time", "date", "%Y-%m-%d"),
        "value": (None, None, None),
    },
    f"{REF}/examples/example_2.csv": {
        "y": ("geo", "latitude", None),
        "x": ("geo", "longitude", None),
        "city": ("geo", "city", None),
        "country": ("geo", "ISO2", None),
        "ts": ("time", "date", "%B %d, %Y"),
        "value": (None, None, None),
    },
    f"{REF}/examples/example_3.csv": {
        "lat": ("geo", "latitude", None),
        "lng": ("geo", "latitude", None),   # sic — reference skip table
        "region": ("geo", "region", None),  # via header fuzzy fallback
        "place_name": ("geo", "city", None),
        "month": ("time", "date", "%m"),
        "day": ("time", "date", "%d"),
        "year": ("time", "date", "%Y"),
        "value": (None, None, None),
    },
    f"{REF}/examples/example_4.csv": {
        "country": ("geo", "country_name", None),
        "value": (None, None, None),
        "Latitude": ("geo", "latitude", None),
        "Longitude": ("geo", "longitude", None),
        "Y/d/m": (None, None, None),        # %Y/%d/%m not in the catalog
        "month_name": ("time", "date", "%B"),
        "month_number": ("time", "date", "%m"),
        "year": ("time", "date", "%Y"),
        "Day_name": ("time", "date", "%A"),
        "Day Number": ("time", "date", "%d"),
        "bool": (None, None, None),
    },
    f"{REF}/cartwright/datasets/fake_data.csv": {
        "country": ("geo", "country_name", None),
        "value": (None, None, None),
        "latitude": ("geo", "latitude", None),
        "longitude": ("geo", "longitude", None),
        "m/d/y": ("time", "date", "%m/%d/%y"),
        "m-d-Y": ("time", "date", "%m-%d-%Y"),
        "d/m/y": ("time", "date", "%d/%m/%y"),
        "d Month Y": ("time", "date", "%d %B %Y"),
        "seconds_epoch": ("time", "date", "unix_time"),
        "month_name": ("time", "date", "%B"),
        "month": ("time", "date", "%m"),
        "year": ("time", "date", "%Y"),
        "Year": ("time", "date", "%Y"),
        "Day_name": ("time", "date", "%A"),
        "Day Number": ("time", "date", "%d"),
        "results": (None, None, None),
    },
}


@pytest.mark.parametrize("path", list(EXPECTED))
def test_conformance(path):
    df = pd.read_csv(path, encoding="latin-1")
    cls = classify_table(pa.Table.from_pandas(df))
    got = {c.column: (c.category, c.subcategory, c.format)
           for c in cls.classifications}
    assert got == EXPECTED[path]


def test_categorize_projection():
    """categorize() drops unclassified columns (categorize.py:465-474)."""
    df = pd.read_csv(f"{REF}/examples/example_1.csv")
    cls = classify_table(pa.Table.from_pandas(df))
    cat = categorize(cls)
    assert "value" not in cat
    assert cat["date"] == {"category": "time", "subcategory": "date",
                           "format": "%Y-%m-%d"}


def test_fuzzy_column_attached():
    df = pd.read_csv(f"{REF}/examples/example_1.csv")
    cls = classify_table(pa.Table.from_pandas(df))
    by_col = {c.column: c for c in cls.classifications}
    assert by_col["latitude"].fuzzyColumn.matchedKey in ("Lat", "Latitude")
    assert by_col["latitude"].fuzzyColumn.ratio == 100
    assert "fuzzy" in by_col["latitude"].match_type


def test_latlong_composite_column():
    """V3: "lat, lon" composite strings classify as geo/latlong
    (`cartwright/categories/geos.py:161-178`; note the reference's own
    Subcategory enum lacks 'latlong' — we keep the class label)."""
    import random
    r = random.Random(1)
    vals = [f"{r.uniform(-90, 90):.4f}, {r.uniform(-180, 180):.4f}"
            for _ in range(60)]
    tbl = pa.table({"position": pa.array(vals)})
    cls = classify_table(tbl)
    c = cls.classifications[0]
    assert c.category == "geo" and c.subcategory == "latlong"


def test_timeout_budget_parity():
    """seconds_to_finish=0 labels every non-skipped column 'timeout'
    (reference `categorize.py:213,275-283`)."""
    df = pd.read_csv(f"{REF}/examples/example_1.csv")
    cls = classify_table(pa.Table.from_pandas(df), seconds_to_finish=0.0)
    got = {c.column: c.category for c in cls.classifications}
    # latitude/longitude are header-skipped → still classified via skip path
    assert got["latitude"] == "geo" and got["longitude"] == "geo"
    assert got["date"] == "timeout"
    assert got["value"] == "timeout"


def test_city_column_classifies():
    """Round-2 gazetteer expansion (VERDICT r01 task 6): a realistic mixed
    city column — large and mid-size cities across continents, some with
    multi-word names — classifies geo/city via the 2-of-5 fuzzy subsample
    (`/root/reference/cartwright/categories/geos.py:18-34` semantics)."""
    from cartwright_ray.detectors.cascade import classify_series
    col = ["Kalamazoo", "Ouagadougou", "Chiang Mai", "Bobo-Dioulasso",
           "Kisumu", "Santa Cruz de la Sierra", "Pietermaritzburg",
           "Nizhny Novgorod", "Gold Coast", "Cluj-Napoca", "Antofagasta",
           "Thiruvananthapuram"]
    res = classify_series(col)
    assert res["category"] == "geo"
    assert res["subcategory"] == "city"


def test_gazetteer_size():
    from cartwright_ray.resources import CITIES
    assert len(set(CITIES)) > 2000   # round-2 expansion floor


def test_city_recall_held_out_sample():
    """Round-3 gazetteer widening (VERDICT r02 Next #8): a held-out sample
    of real-world secondary cities — regional capitals and district towns
    across every continent, NOT drawn from any fixture used to tune the
    list — must classify geo/city under the reference's 2-of-5 fuzzy
    subsample rule (`cartwright/categories/geos.py:18-34`). Columns mix
    clean values with case/whitespace perturbations so both the exact
    normalized path and the fuzzy >90 path are exercised."""
    from cartwright_ray.detectors.cascade import classify_series
    held_out_columns = [
        # Africa secondary
        ["Bobo-Dioulasso", "Mwanza", "Nakuru", "Bamenda", "Tete"],
        # Latin America interior
        ["Arequipa", "Manizales", "Chillan", "Maringa", "Tarija"],
        # Europe regional
        ["Plovdiv", "Oulu", "Gdynia", "Brasov", "Salzburg"],
        # Asia district seats
        ["Cebu", "Mandalay", "Udon Thani", "Kurashiki", "Rajshahi"],
        # US/Canada mid-size
        ["Chattanooga", "Moncton", "Spokane", "Fargo", "Saguenay"],
        # perturbed case/whitespace (exact-normalized path)
        ["  kigali ", "ADDIS ABABA", "ulaanbaatar", " Wroclaw", "tbilisi"],
        # Oceania / Middle East
        ["Toowoomba", "Tauranga", "Irbid", "Tabriz", "Launceston"],
    ]
    for col in held_out_columns:
        res = classify_series(col)
        assert res["category"] == "geo", col
        assert res["subcategory"] == "city", col


def test_gazetteer_round3_size():
    """Round-3 floor: ~9k unique entries (toward the reference's 24,534)."""
    from cartwright_ray.resources import CITIES
    assert len(set(CITIES)) > 8500
