"""JSON scalar-field extraction (stages/json_field.py) vs json.loads."""

import json

import numpy as np
import pyarrow as pa
import pytest

from cartwright_ray.stages.json_field import json_field


def _ds(ray, texts, nblocks=3):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "i": pa.array(range(len(texts)), pa.int64()),
        "js": pa.array(texts, pa.string())})).repartition(nblocks)


def test_scalar_kinds_match_json_loads(ray_session):
    texts = ['{"k": 69, "x": 1}', '{"x": 2, "k": -3.5e2}',
             '{"k": "hello", "y": []}', '{"k": true}', '{"k": null}',
             '{"other": 1}', '{ "k" : 42 }']
    out = json_field(_ds(ray_session, texts), "js", "k").to_pandas() \
        .sort_values("i")
    want = []
    for t in texts:
        v = json.loads(t).get("k")
        want.append(None if v is None else
                    (str(v).lower() if isinstance(v, bool) else str(v)))
    got = [None if v is None or (isinstance(v, float) and np.isnan(v))
           else v for v in out["k"]]
    # numeric formatting: engine keeps the raw token text
    assert got == ["69", "-3.5e2", "hello", "true", None, None, "42"]
    assert want[0] == "69"


def test_string_null_token_survives(ray_session):
    """A genuine JSON STRING value "null" must come back as the string,
    not be rewritten to null — only the bare-scalar branch carries the
    JSON null token (ADVICE r03)."""
    texts = ['{"k": "null"}', '{"k": null}', '{"k": "x"}']
    out = json_field(_ds(ray_session, texts), "js", "k").to_pandas() \
        .sort_values("i")
    got = [None if v is None or (isinstance(v, float) and np.isnan(v))
           else v for v in out["k"]]
    assert got == ["null", None, "x"]


def test_typed_cast(ray_session):
    texts = ['{"k": 10}', '{"k": 20}', '{"nope": 1}']
    out = json_field(_ds(ray_session, texts), "js", "k",
                     out_type=pa.int64()).to_pandas().sort_values("i")
    vals = out["k"].tolist()
    assert vals[0] == 10 and vals[1] == 20
    assert vals[2] is None or np.isnan(vals[2])


def test_matches_events_table(ray_session):
    import pyarrow.parquet as pq
    import ray.data
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["event_id", "props"])
    ds = ray.data.from_arrow(t).repartition(4)
    out = json_field(ds, "props", "k", out_type=pa.int64()).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    df = t.to_pandas().sort_values("event_id").reset_index(drop=True)
    want = df["props"].map(lambda p: json.loads(p)["k"])
    assert (out["k"].to_numpy() == want.to_numpy()).all()
