"""Drop-in API parity + generator round-trip."""

import json
import subprocess
import sys

import pyarrow as pa

from cartwright_ray import api
from cartwright_ray.detectors.cascade import classify_series
from cartwright_ray.detectors.generate import generate_training_table

REF = "/root/reference"


def test_api_shapes():
    out = api.columns_categorized(path=f"{REF}/examples/example_1.csv")
    assert set(out) == {"latitude", "longitude", "date", "value"}
    assert out["date"]["category"] == "time"
    assert out["date"]["format"] == "%Y-%m-%d"
    assert "time_resolution" in out["date"]

    cat = api.categorize(path=f"{REF}/examples/example_1.csv")
    assert "value" not in cat and cat["latitude"]["category"] == "geo"


def test_cli():
    proc = subprocess.run(
        [sys.executable, "-m", "cartwright_ray.categorize",
         f"{REF}/examples/example_1.csv"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout)
    assert out["date"]["format"] == "%Y-%m-%d"


def test_generated_samples_classify_back():
    """Column-level round trip: a column of generated samples for label L
    classifies as the category L maps to (validatable labels)."""
    tbl = generate_training_table(4000, seed=1)
    by_label = {}
    for lab, val in zip(tbl["label"].to_pylist(), tbl["value"].to_pylist()):
        by_label.setdefault(lab, []).append(val)
    # a representative subset spanning kinds
    for lab, want in [("%Y-%m-%d", "%Y-%m-%d"), ("%Y:%Y", "%Y:%Y"),
                      ("unix_time", "unix_time"), ("%B", "%B")]:
        samples = by_label.get(lab, [])
        if len(samples) >= 20:
            res = classify_series(samples)
            assert res["format"] == want, (lab, res)
    lat = by_label.get("latitude", [])
    if len(lat) >= 20:
        assert classify_series(lat)["subcategory"] == "latitude"
