"""Ray-level pipeline tests: distributed classification parity, resolution
wrappers, flagship chain, checkpoint/resume, driver contract."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_classify_dataset_matches_local(ray_session):
    import ray.data
    from cartwright_ray.detectors.cascade import classify_dataset, classify_table
    df = pd.read_csv("/root/reference/examples/example_2.csv")
    tbl = pa.Table.from_pandas(df)
    local = classify_table(tbl)
    ds = ray.data.from_pandas(df).repartition(4)
    dist = classify_dataset(ds)
    lmap = {c.column: (c.category, c.subcategory, c.format)
            for c in local.classifications}
    dmap = {c.column: (c.category, c.subcategory, c.format)
            for c in dist.classifications}
    assert lmap == dmap


def test_classify_dataset_null_column(ray_session):
    import ray.data
    from cartwright_ray.detectors.cascade import classify_dataset
    df = pd.DataFrame({"empty": [None] * 50,
                       "lat": np.round(np.random.default_rng(0)
                                       .uniform(-80, 80, 50), 6)})
    dist = classify_dataset(ray.data.from_pandas(df))
    got = {c.column: c.category for c in dist.classifications}
    assert got["empty"] is None
    assert got["lat"] == "geo"


def test_temporal_resolution_ds(ray_session):
    import ray.data
    from cartwright_ray.analysis.time_resolution import detect_temporal_resolution_ds
    from cartwright_ray.detectors.schemas import TimeUnit, Uniformity
    ts = pd.date_range("2020-01-01", periods=500, freq="D")
    ds = ray.data.from_pandas(pd.DataFrame({"ts": ts})).repartition(4)
    r = detect_temporal_resolution_ds(ds, "ts")
    assert r.unit == TimeUnit.day
    assert r.uniformity == Uniformity.PERFECT
    assert r.resolution == pytest.approx(1.0)


def test_spatial_resolution_ds(ray_session):
    import ray.data
    from cartwright_ray.analysis.space_resolution import detect_latlon_resolution_ds
    from cartwright_ray.detectors.schemas import AngleUnit
    lats = np.arange(-30.0, 30.0, 2.0)
    lons = np.arange(-60.0, 60.0, 2.0)
    glat, glon = np.meshgrid(lats, lons)
    # duplicated points exercise the distributed dedup
    df = pd.DataFrame({"lat": np.tile(glat.ravel(), 3),
                       "lon": np.tile(glon.ravel(), 3)})
    ds = ray.data.from_pandas(df).repartition(4)
    r = detect_latlon_resolution_ds(ds, "lat", "lon")
    assert r.square is not None
    assert r.square.unit == AngleUnit.degrees
    assert r.square.resolution == pytest.approx(2.0)


def test_flagship_pipeline(ray_session):
    from cartwright_ray.pipelines.flagship import flagship_pipeline
    df = flagship_pipeline(SF).to_pandas()
    assert len(df) > 0
    for col in ["doc_id", "span_idx", "lat", "lon", "geohash", "h3_r7",
                "s2_token", "tile_x", "tile_y", "admin_id"]:
        assert col in df.columns
    # every joined point actually lies inside its polygon (oracle-lite)
    from cartwright_ray.geo.pip import points_in_polygon
    from cartwright_ray.sources.synth import ADMIN_POLYGONS
    polys = {}
    for p in ADMIN_POLYGONS:
        polys.setdefault(p["admin_id"], []).append(p)
    for _, r in df.head(30).iterrows():
        assert any(points_in_polygon(np.array([r["lat"]]), np.array([r["lon"]]),
                                     np.array(p["ring_lat"]),
                                     np.array(p["ring_lon"]))[0]
                   for p in polys[r["admin_id"]])


def test_flagship_determinism(ray_session):
    from cartwright_ray.pipelines.flagship import flagship_pipeline
    a = flagship_pipeline(SF).to_pandas()
    b = flagship_pipeline(SF).to_pandas()
    key = ["doc_id", "span_idx", "admin_id"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))


def test_checkpointed_write_and_resume(ray_session, tmp_path):
    import ray.data
    from cartwright_ray.state.checkpoint import checkpointed_write, read_manifest
    from cartwright_ray.sources.synth import synth_corpus
    out = str(tmp_path / "out")
    corpus = synth_corpus(400, parallelism=8)
    s1 = checkpointed_write(corpus, out)
    assert s1["written"] > 1 and s1["skipped"] == 0
    total = s1["rows"]
    manifest = read_manifest(out)
    assert len(manifest) == s1["written"]
    assert sum(m["row_count"] for m in manifest.values()) == total

    # simulate a lost partition: delete one data file + its manifest entry
    lost = sorted(manifest)[0]
    os.remove(os.path.join(out, f"part-{lost}.parquet"))
    os.remove(os.path.join(out, "_manifest", f"{lost}.json"))

    corpus2 = synth_corpus(400, parallelism=8)
    s2 = checkpointed_write(corpus2, out)
    assert s2["written"] == 1            # only the lost partition is redone
    assert s2["skipped"] == s1["written"] - 1
    # no duplicates, no missing rows
    import pyarrow.parquet as pq
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    back = pa.concat_tables([pq.read_table(os.path.join(out, f)) for f in files])
    assert back.num_rows == total
    assert len(set(back.column("doc_id").to_pylist())) == 400

    # a third run touches nothing
    s3 = checkpointed_write(synth_corpus(400, parallelism=8), out)
    assert s3["written"] == 0 and s3["skipped"] == s1["written"]


def test_driver_contract(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    res = entrymod.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) >= 0 and len(df.columns) > 5
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # spot-run two cheap queries at the smallest sf
    out = qs["q1_pricing_summary"](SF)
    assert len(out) == 6
    out = qs["temporal_resolution_events"](SF)
    assert out["unit"].iloc[0] in ("second", "minute", "hour")


def test_checkpoint_metrics(ray_session, tmp_path):
    from cartwright_ray.state.checkpoint import checkpointed_write, read_manifest
    from cartwright_ray.pipelines.flagship import encoded_points
    out = str(tmp_path / "enc")
    enc = encoded_points(SF)
    stats = checkpointed_write(enc, out, metrics_cols=("h3_r5",))
    manifest = read_manifest(out)
    assert stats["written"] == len(manifest) > 0
    some = next(iter(manifest.values()))
    assert "h3_r5" in some["metrics"]
    assert sum(some["metrics"]["h3_r5"].values()) <= some["row_count"]


def test_tile_sink_resume_exact(ray_session, tmp_path):
    """Key-partitioned tile sink: re-run skips everything; a lost
    partition is rebuilt alone (resume survives the wide shuffle)."""
    from cartwright_ray.pipelines.flagship import flagship_to_tiles
    from cartwright_ray.state.checkpoint import read_manifest
    out = str(tmp_path / "tiles")
    s1 = flagship_to_tiles(SF, out)
    assert s1["written"] > 1 and s1["skipped"] == 0
    s2 = flagship_to_tiles(SF, out)
    assert s2["written"] == 0 and s2["skipped"] == s1["written"]
    lost = sorted(read_manifest(out))[0]
    os.remove(os.path.join(out, f"part-{lost}.parquet"))
    os.remove(os.path.join(out, "_manifest", f"{lost}.json"))
    s3 = flagship_to_tiles(SF, out)
    assert s3["written"] == 1 and s3["skipped"] == s1["written"] - 1
    assert s3["rows"] == s1["rows"]


def test_classify_dataset_nested_columns(ray_session):
    """Nested list/struct columns must classify (to None) without
    crashing — the corpus schema itself is a valid classification input."""
    from cartwright_ray.detectors.cascade import classify_dataset
    from cartwright_ray.sources.synth import interleave_documents
    import ray.data
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"]).limit(50)
    corpus = interleave_documents(docs)
    cls = classify_dataset(corpus)
    got = {c.column: c.category for c in cls.classifications}
    assert set(got) == {"doc_id", "spans"}
    assert got["spans"] is None


def test_tile_pyramid_exact_and_consistent(ray_session):
    import pyarrow.parquet as pq

    from cartwright_ray.geo.mercator import lonlat_to_tile
    from cartwright_ray.pipelines.relational import tile_pyramid
    sf = "/root/testdata/sf0.001"
    out = tile_pyramid(sf)
    v = np.asarray(pq.read_table(f"{sf}/embeddings.parquet",
                                 columns=["vec_id"])["vec_id"],
                   dtype=np.int64)
    lat = (v * 7919 % 170).astype(np.float64) - 85.0 + 0.5
    lon = (v * 104729 % 360).astype(np.float64) - 180.0 + 0.5
    n_total = len(v)
    for z in (10, 8, 6, 4):
        x, y = lonlat_to_tile(lon, lat, z)
        key = x.astype(np.int64) << 32 | y.astype(np.int64)
        uniq, counts = np.unique(key, return_counts=True)
        want = {(int(k >> 32), int(k & 0xFFFFFFFF)): int(c)
                for k, c in zip(uniq, counts)}
        lvl = out[out["zoom"] == z]
        got = {(int(r["tile_x"]), int(r["tile_y"])): int(r["n_points"])
               for _, r in lvl.iterrows()}
        assert got == want
        assert int(lvl["n_points"].sum()) == n_total   # mass conserved


def test_lineage_report(ray_session, tmp_path):
    import ray.data

    from cartwright_ray.state.checkpoint import (checkpointed_write_by_key,
                                                 lineage_report)
    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 3, "v": range(8)})
    out = str(tmp_path / "sink")
    checkpointed_write_by_key(ray.data.from_pandas(df), out, part_col="k")
    rep = lineage_report(out)
    assert rep["partitions"] == 2 and rep["rows"] == 8
    keys = sorted(p["key"] for p in rep["partition_index"].values())
    assert keys == ["a", "b"]
    assert rep["bytes"] > 0
