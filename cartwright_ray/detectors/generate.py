"""Seeded synthetic training-sample generation — reference entry point 4
(`cartwright/generate_training_data.py:99-117`): one (label, value) sample
per row, drawn from each category class's generator recipe. faker is
unavailable, so generators synthesize from the same value spaces the
validators accept (the round-trip property the reference tests,
`tests/test_dates.py:64-69`). Output feeds fixture generation and fuzz
tests; there is no LSTM to train in this engine.
"""

from __future__ import annotations

import datetime
import random

import numpy as np

from ..resources import CITIES, CONTINENT_CODES, CONTINENT_NAMES, COUNTRIES, STATE_NAMES
from .registry import (DATE_FORMATS, DAYS_A, DAYS_a, MONTHS_B, MONTHS_b,
                       TIMESPAN_FORMATS)

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta output input "
          "result sample test data value record entry note field").split()


def _dt(r: random.Random) -> datetime.datetime:
    return datetime.datetime(1901, 1, 1) + datetime.timedelta(
        seconds=r.randrange(0, 4_000_000_000))


def _generators(r: random.Random) -> dict:
    g = {}
    for fmt in DATE_FORMATS:
        g[fmt] = (lambda f=fmt: _dt(r).strftime(f))
    for fmt, sep, part in TIMESPAN_FORMATS:
        if part == "year":
            g[fmt] = (lambda s=sep: f"{r.randrange(1701, 2199)}{s}"
                                    f"{r.randrange(1701, 2199)}")
        else:
            g[fmt] = (lambda s=sep, p=part: _dt(r).strftime(p) + s
                      + _dt(r).strftime(p))
    g["%Y"] = lambda: str(r.randrange(1701, 2199))
    g["%m"] = lambda: f"{r.randrange(1, 13):02d}"
    g["%d"] = lambda: str(r.randrange(1, 32))
    g["%B"] = lambda: r.choice(MONTHS_B).title()
    g["%b"] = lambda: r.choice(MONTHS_b)
    g["%A"] = lambda: r.choice(DAYS_A).title()
    g["%a"] = lambda: r.choice(DAYS_a)
    g["unix_time"] = lambda: str(r.randrange(100_000_000, 4_000_000_000))
    g["latitude"] = lambda: f"{r.uniform(-90, 90):.6f}"
    g["longitude"] = lambda: f"{r.uniform(-180, 180):.6f}"
    g["latlong"] = lambda: (f"{r.uniform(-90, 90):.4f}, "
                            f"{r.uniform(-180, 180):.4f}")
    g["ISO2"] = lambda: r.choice(COUNTRIES)[1]
    g["ISO3"] = lambda: r.choice(COUNTRIES)[2]
    g["continent"] = lambda: r.choice(CONTINENT_NAMES + CONTINENT_CODES)
    g["country_name"] = lambda: r.choice(COUNTRIES)[0]
    g["state_name"] = lambda: r.choice(STATE_NAMES)
    g["city"] = lambda: r.choice(CITIES)
    g["city_suffix"] = lambda: r.choice(CITIES)
    # misc distractors (never validated — label parity)
    g["pyfloat"] = lambda: str(r.uniform(-1e4, 1e4))
    g["pystr"] = lambda: "".join(r.choice("abcdefghij") for _ in range(12))
    g["paragraph"] = lambda: " ".join(r.choice(_WORDS) for _ in range(12))
    g["boolean"] = lambda: r.choice(["True", "False"])
    g["boolean_letter"] = lambda: r.choice(["t", "f", "T", "F"])
    g["email"] = lambda: f"{r.choice(_WORDS)}@example.com"
    g["zipcode"] = lambda: f"{r.randrange(10000, 99999)}"
    g["phone_number"] = lambda: (f"{r.randrange(100, 999)}-"
                                 f"{r.randrange(100, 999)}-"
                                 f"{r.randrange(1000, 9999)}")
    return g


def generate_training_table(n_rows: int = 10_000, seed: int = 42):
    """(label, value) pyarrow table, seeded (reference
    `generate_training_data.py:99-104` analogue)."""
    import pyarrow as pa
    r = random.Random(seed)
    gens = _generators(r)
    labels = sorted(gens)
    out_l, out_v = [], []
    for _ in range(n_rows):
        lab = labels[r.randrange(len(labels))]
        out_l.append(lab)
        out_v.append(str(gens[lab]()))
    return pa.table({"label": pa.array(out_l, pa.string()),
                     "value": pa.array(out_v, pa.string())})


def generate_training_data(out_dir: str, n_rows: int = 100_000,
                           seed: int = 42, parallelism: int = 8):
    """Distributed version: shards generated through Ray, written as
    train/dev/test parquet splits (reference `save_data`
    `generate_training_data.py:87-96` → `ds.write_parquet`)."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.range(n_rows, override_num_blocks=parallelism)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        out_l, out_v, out_split = [], [], []
        for i in ids:
            r = random.Random((seed << 32) ^ i)
            gens = _generators(r)
            labels = sorted(gens)
            lab = labels[r.randrange(len(labels))]
            out_l.append(lab)
            out_v.append(str(gens[lab]()))
            u = r.random()
            out_split.append("train" if u < 0.94 else
                             "dev" if u < 0.96 else "test")
        return pa.table({"label": pa.array(out_l), "value": pa.array(out_v),
                         "split": pa.array(out_split)})

    ds.map_batches(gen, batch_format="pyarrow").write_parquet(out_dir)
    return out_dir
