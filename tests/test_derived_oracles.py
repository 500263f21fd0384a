"""Round-2 oracle-construction layer + regressions for the bugs the new
oracles caught (pole-adjacent cover sampling, kNN tie ranking, checkpoint
key collisions)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_derived_corpus_layout(ray_session):
    """Every doc: 3 spans; extraction yields (d, 0) always and (d, 2) for
    d % 3 == 0; media spans at span 1 of d % 5 == 0 docs."""
    import pyarrow.parquet as pq

    from cartwright_ray.pipelines.derived import derived_corpus_extracted
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    df = derived_corpus_extracted(SF).to_pandas()
    ids = df["doc_id"].astype(int)
    assert (df["span_idx"] == 0).sum() == n_docs
    second = df[df["span_idx"] == 2]
    assert (second["doc_id"].astype(int) % 3 == 0).all()
    assert len(second) == sum(1 for d in range(n_docs) if d % 3 == 0)
    # formula round-trip: extracted floats equal the derivation exactly
    d0 = df[df["span_idx"] == 0].sort_values("doc_id", key=lambda s: s.astype(int))
    d = d0["doc_id"].astype(int).to_numpy()
    assert np.array_equal(d0["lat"].to_numpy(),
                          (d * 7919 % 170).astype(float) - 85.0 + 0.5)
    assert (d0["iso3"].notna()).all()
    assert (d0["ts"].notna()).all()


def test_planted_clone_dedup_recall_and_precision(ray_session):
    """MinHash (signature-estimate verify) and SimHash recover exactly the
    planted clones on the high-entropy derived corpus."""
    from cartwright_ray.pipelines.derived import planted_clone_docs
    from cartwright_ray.stages.dedup import minhash_lsh_dedup, simhash_dedup
    ds = planted_clone_docs(SF, clones=10)
    want = {(d + 100000, d) for d in range(10)}
    mh = minhash_lsh_dedup(ds, threshold=0.8).to_pandas()
    assert set(zip(mh["dup_id"], mh["kept_id"])) == want
    sh = simhash_dedup(ds, max_hamming=3).to_pandas()
    assert set(zip(sh["dup_id"], sh["kept_id"])) == want
    assert (sh["hamming"] == 0).all()


def test_minhash_estimate_close_to_exact(ray_session):
    """Signature-estimated jaccard is within the ±1/√num_perm band of the
    exact value for the pairs both modes emit."""
    import ray.data

    from cartwright_ray.stages.dedup import (_shingle_set, jaccard,
                                             minhash_lsh_dedup)
    texts = [f"common prefix words shared by all docs variant {i} "
             "plus a long tail of repeated filler text to shingle"
             for i in range(20)]
    texts += [t + " x" for t in texts[:5]]          # near-clones
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = minhash_lsh_dedup(ray.data.from_pandas(df).repartition(2),
                            threshold=0.7).to_pandas()
    for _, r in out.iterrows():
        exact = jaccard(_shingle_set(texts[int(r["dup_id"])]),
                        _shingle_set(texts[int(r["kept_id"])]))
        assert abs(r["jac_est"] - exact) < 0.2


def test_pip_cover_near_poles(ray_session):
    """Regression (round-2 oracle catch): degree-space cover sampling
    missed hex cells near the poles; mercator-space sampling must not."""
    from cartwright_ray.joins.pip_join import PolygonIndex
    cap = {"admin_id": "CAP", "name": "cap",
           "ring_lat": [84, 84, 89.9, 89.9],
           "ring_lon": [-180, 180, 180, -180]}
    idx = PolygonIndex([cap])
    lats = np.full(360, 84.5)
    lons = np.arange(-180.0, 180.0, 1.0)
    hit, admin, _ = idx.probe(lats, lons)
    assert len(hit) == 360          # every point found despite stretching


def test_knn_duplicate_feature_positions(ray_session):
    """Two features at the SAME position: tie must resolve by feat_id
    (the oracle's ORDER BY round(dist,6), feat_id)."""
    import ray.data

    from cartwright_ray.joins.knn_join import knn_join
    feats = {"feat_id": ["B1", "A1", "C9"],
             "lat": [10.0, 10.0, 50.0],
             "lon": [20.0, 20.0, 60.0]}
    pts = ray.data.from_pandas(pd.DataFrame({"lat": [10.5], "lon": [20.5]}))
    out = knn_join(pts, feats, k=2).to_pandas().sort_values("neighbor_rank")
    assert out["feat_id"].tolist() == ["A1", "B1"]


def test_checkpoint_key_collision(ray_session, tmp_path):
    """'a b' and 'a_b' sanitize identically but must get distinct
    partitions (ADVICE r01)."""
    import ray.data

    from cartwright_ray.state.checkpoint import (checkpointed_write_by_key,
                                                 read_manifest)
    df = pd.DataFrame({"k": ["a b", "a_b", "x/1", "x_1"],
                       "v": [1, 2, 3, 4]})
    out = str(tmp_path / "ckpt")
    stats = checkpointed_write_by_key(ray.data.from_pandas(df), out, "k")
    assert stats["written"] == 4 and stats["rows"] == 4
    man = read_manifest(out)
    assert len(man) == 4
    assert {r["key"] for r in man.values()} == {"a b", "a_b", "x/1", "x_1"}
    # resume: all four skip
    stats2 = checkpointed_write_by_key(ray.data.from_pandas(df), out, "k")
    assert stats2["written"] == 0 and stats2["skipped"] == 4


def test_lang_derived_detection(ray_session):
    from cartwright_ray.pipelines.derived import (DERIVED_LANG_PHRASES,
                                                  lang_derived_docs)
    from cartwright_ray.stages.textstats import detect_language
    out = detect_language(lang_derived_docs(SF), concurrency=1).to_pandas()
    want = {d: DERIVED_LANG_PHRASES[d % 4][0]
            for d in out["doc_id"].astype(int)}
    got = dict(zip(out["doc_id"].astype(int), out["lang_pred"]))
    assert got == want
