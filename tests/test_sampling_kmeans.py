"""Sampling / heavy-hitter / k-means operator tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_hash_sample_deterministic_and_unbiased(ray_session):
    import ray
    from cartwright_ray.stages.sampling import hash_sample, lehmer_hash

    df = pd.DataFrame({"id": np.arange(20000), "x": np.arange(20000) * 2})
    a = hash_sample(ray.data.from_pandas(df).repartition(4),
                    "id", 0.1).to_pandas()
    b = hash_sample(ray.data.from_pandas(df).repartition(9),
                    "id", 0.1).to_pandas()
    # partitioning-independent membership
    assert sorted(a["id"]) == sorted(b["id"])
    # matches the scalar definition
    cut = int(0.1 * 2147483647)
    want = df[lehmer_hash(df["id"].to_numpy()) < cut]
    assert sorted(a["id"]) == want["id"].tolist()
    # roughly the requested fraction
    assert 0.08 < len(a) / len(df) < 0.12


@pytest.mark.parametrize("plan", [{}, {"small_limit": 0}])
def test_stratified_topk_sample_per_key(ray_session, plan):
    import ray
    from cartwright_ray.stages.sampling import (stratified_topk_sample,
                                                lehmer_hash)

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "id": np.arange(n),
        "key": rng.choice(["a", "b", "c", "rare"], n,
                          p=[0.5, 0.3, 0.198, 0.002]),
    })
    out = stratified_topk_sample(
        ray.data.from_pandas(df).repartition(7), "key", "id",
        k=15, **plan).to_pandas()
    h = lehmer_hash(df["id"].to_numpy())
    df2 = df.assign(h=h)
    for key, g in df2.groupby("key"):
        want = g.sort_values(["h", "id"]).head(15)
        got = out[out["key"] == key].sort_values(["h", "id"])
        assert got["id"].tolist() == want["id"].tolist(), key
    # appended hash column matches the definition
    assert (out["h"].to_numpy() ==
            lehmer_hash(out["id"].to_numpy())).all()


def test_top_tokens_matches_counter(ray_session):
    import collections
    import re
    import ray
    from cartwright_ray.stages.sampling import top_tokens

    texts = ["the cat sat on the mat", "the dog", "a cat and a dog",
             "", "   ", "mat mat mat"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
    out = top_tokens(ds, k=4).to_pandas()
    counter = collections.Counter(
        tok for t in texts for tok in re.split(r"\s+", t) if tok)
    want = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(out["token"], out["n"])) == want


def test_kmeans_matches_driver_replication(ray_session):
    import ray
    from cartwright_ray.stages.kmeans import kmeans_fit, _assign

    rng = np.random.default_rng(11)
    k, d, n = 5, 8, 400
    centers = rng.normal(0, 4, (k, d))
    X32 = (centers[rng.integers(0, k, n)]
           + rng.normal(0, 0.3, (n, d))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(X32.tolist(), pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = kmeans_fit(ds, k=k, iters=3)

    X = X32.astype(np.float64)
    cents = X[:k].copy()
    for _ in range(3):
        a = _assign(X, cents)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = X[m].mean(axis=0)
    # float32 inputs sum exactly in float64 at these sizes, so the
    # distributed partial-sum reduction is bit-identical to np.mean
    assert np.abs(got - cents).max() < 1e-12


def test_kmeans_seeding_never_sorts(ray_session):
    """VERDICT r03 Next #2: seeding is per-block k-smallest partials,
    not a global sort(id).limit(k) range shuffle of the corpus."""
    import ray
    from ray.data import Dataset

    from cartwright_ray.stages.kmeans import kmeans_fit

    rng = np.random.default_rng(3)
    n, d = 300, 4
    tbl = pa.table({
        "vec_id": pa.array(rng.permutation(n), pa.int64()),
        "embedding": pa.array(
            rng.normal(size=(n, d)).astype(np.float32).tolist(),
            pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(6)

    real_sort = Dataset.sort

    def _poisoned(self, *a, **k):
        raise AssertionError("global sort in kmeans seeding")

    Dataset.sort = _poisoned
    try:
        cents = kmeans_fit(ds, k=4, iters=1)
    finally:
        Dataset.sort = real_sort
    assert cents.shape == (4, d)


def test_kmeans_summary_counts_and_floor_margin(ray_session):
    import ray
    from cartwright_ray.stages.kmeans import kmeans_summary

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    t = kmeans_summary(ds, k=10, iters=2).to_pandas()
    n_rows = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet").count()
    per_cluster = t.groupby("cluster")["n"].first()
    assert per_cluster.sum() == n_rows
    assert (per_cluster > 0).all()      # no starved cluster on testdata
    # floor-boundary margin (docstring claim): no floored coordinate sits
    # within 1e-6 of a 1e-4 grid edge relative to the raw value
    raw = t["val"].to_numpy() * 1e4
    frac = np.abs(raw - np.round(raw))
    assert ((frac < 1e-9) | (frac > 1e-6)).all()


def test_zscore_by_key_matches_pandas(ray_session):
    import ray
    from cartwright_ray.stages.normalize import zscore_by_key

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(3000),
        "k": rng.choice(["a", "b", "c"], 3000),
        "v": np.round(rng.normal(50, 20, 3000), 2),
    })
    out = zscore_by_key(ray.data.from_pandas(df).repartition(5),
                        "k", "v").to_pandas().sort_values("id")
    cents = np.floor(df["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref = df.assign(c=cents)
    got = out["z"].to_numpy()
    for key, g in ref.groupby("k"):
        n = len(g)
        mean = g["c"].sum() / n / 100.0
        var = (g["c"] * g["c"]).sum() / n / 10000.0 - mean * mean
        std = np.sqrt(var)
        want = np.floor((g["c"] / 100.0 - mean) / std * 1e6) / 1e6
        sel = out["id"].isin(g["id"])
        assert np.array_equal(out[sel].sort_values("id")["z"].to_numpy(),
                              want.to_numpy())


def test_hll_distinct_error_and_merge_invariance(ray_session):
    import ray
    from cartwright_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(17)
    true_n = 10_000
    ids = np.concatenate([np.arange(true_n), rng.integers(0, true_n, 20_000)])
    df = pd.DataFrame({"user_id": ids})
    est4 = hll_distinct(ray.data.from_pandas(df).repartition(4), "user_id")
    est9 = hll_distinct(ray.data.from_pandas(df).repartition(9), "user_id")
    # registers merge by max -> estimate is partitioning-invariant
    assert est4 == est9
    # 3 sigma at p=12 is ~5%
    assert abs(est4 - true_n) / true_n < 0.05
    # small-cardinality linear-counting regime
    small = pd.DataFrame({"user_id": np.arange(50)})
    est_small = hll_distinct(ray.data.from_pandas(small).repartition(2),
                             "user_id")
    assert abs(est_small - 50) / 50 < 0.05


def test_heavy_hitters_exact_under_compression(ray_session):
    """capacity << block vocab forces real Misra-Gries compression; the
    recount still returns the exact top-k (planted skew dominates the
    summed thresholds, so the self-check passes)."""
    import pandas as pd
    import ray.data
    from cartwright_ray.stages.sketch import heavy_hitter_tokens

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(200):
        body = list(rng.choice(vocab, size=30))
        rows.append(" ".join(["hot"] * 5 + ["warm"] * 3 + body))
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(200), "text": rows})).repartition(8)
    out = heavy_hitter_tokens(ds, k=2, capacity=16).to_pandas()
    assert out["token"].tolist() == ["hot", "warm"]
    assert out["n"].tolist() == [1000, 600]


def test_heavy_hitters_self_check_trips_when_unprovable(ray_session):
    """Uniform data with a tiny capacity cannot certify exactness — the
    stage must refuse loudly rather than return an approximate top-k."""
    import pandas as pd
    import pytest as pt
    import ray.data
    from cartwright_ray.stages.sketch import heavy_hitter_tokens

    rng = np.random.default_rng(5)
    vocab = [f"u{i}" for i in range(500)]
    rows = [" ".join(rng.choice(vocab, size=40)) for _ in range(300)]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(300), "text": rows})).repartition(8)
    with pt.raises(AssertionError, match="not provably exact"):
        heavy_hitter_tokens(ds, k=5, capacity=4)


def test_winsorize_by_key_exact_bounds(ray_session):
    import pandas as pd
    import ray.data
    from cartwright_ray.stages.normalize import winsorize_by_key

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"event_id": np.arange(400),
                       "event_type": [f"t{i % 3}" for i in range(400)],
                       "value": rng.normal(0, 100, 400)})
    out = winsorize_by_key(ray.data.from_pandas(df).repartition(5),
                           "event_type", "value").to_pandas()
    for t, g in df.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        n = len(v)
        lo, hi = v[(n * 10 + 99) // 100 - 1], v[(n * 90 + 99) // 100 - 1]
        got = out[out["event_type"] == t].sort_values("event_id")
        want = np.clip(g.sort_values("event_id")["value"].to_numpy(),
                       lo, hi)
        assert np.array_equal(got["value_clipped"].to_numpy(), want)


def test_label_centroids_vs_pandas(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.kmeans import label_centroids

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    out = label_centroids(
        ray.data.from_arrow(t).repartition(4)).to_pandas()
    df = t.to_pandas()
    for lab, g in df.groupby("label"):
        V = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        want = np.floor(V.mean(axis=0) * 1e4) / 1e4
        got = out[out["label"] == lab].sort_values("dim")
        assert np.array_equal(got["coord"].to_numpy(), want)
        assert (got["n"] == len(g)).all()


def test_rerank_differs_from_pure_truncated(ray_session):
    """Two-stage = full-dim order restricted to the truncated shortlist:
    verify against a direct numpy replay of both stages."""
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.ann import rerank_ann_search

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet") \
        .to_pandas()
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].values
    queries = {"query_id": [0], "vec": V[:1]}
    out = rerank_ann_search(ray.data.from_pandas(emb).repartition(3),
                            queries, k=5, shortlist=20,
                            dims=16).to_pandas()
    T = V[:, :16] / np.linalg.norm(V[:, :16], axis=1, keepdims=True)
    ts = np.round(T[0] @ T.T, 6)
    short = ids[np.lexsort((ids, -ts))[:20]]
    F = V / np.linalg.norm(V, axis=1, keepdims=True)
    fs = np.round(F[0] @ F.T, 6)
    mask = np.isin(ids, short)
    order = np.lexsort((ids[mask], -fs[mask]))[:5]
    assert out.sort_values("rank")["vec_id"].tolist() \
        == ids[mask][order].tolist()
