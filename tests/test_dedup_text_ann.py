"""Dedup / text-analysis / similarity-search operators vs oracles."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    import pyarrow.parquet as pq
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_exact_dedup(ray_session, docs_df):
    import ray.data
    from cartwright_ray.stages.dedup import exact_dedup
    df = docs_df.head(100).copy()
    clones = df.head(20).copy()
    clones["doc_id"] = clones["doc_id"] + 10_000   # same text, larger id
    test_df = pd.concat([df, clones])
    out = exact_dedup(ray.data.from_pandas(test_df).repartition(4)).to_pandas()
    # duckdb-style oracle
    want = test_df.sort_values("doc_id").groupby("text", sort=False) \
                  .head(1)["doc_id"]
    assert sorted(out["doc_id"]) == sorted(want)


def test_minhash_lsh_vs_bruteforce(ray_session, docs_df):
    import ray.data
    from cartwright_ray.stages.dedup import (brute_force_near_dups,
                                             minhash_lsh_dedup)
    df = docs_df.head(150).copy()
    near = df.head(15).copy()
    near["doc_id"] = near["doc_id"] + 10_000
    near["text"] = near["text"] + " tail tweak"
    test_df = pd.concat([df, near])
    out = minhash_lsh_dedup(ray.data.from_pandas(test_df).repartition(4),
                            threshold=0.8, verify="exact").to_pandas()
    oracle = brute_force_near_dups(test_df["text"].tolist(),
                                   test_df["doc_id"].tolist(), 0.8)
    got = set(out["dup_id"])
    want = set(oracle)
    # LSH with 16 bands × 4 rows at jaccard≥0.8 → near-certain recall
    assert want <= got or len(want - got) <= max(1, len(want) // 10)
    # verify step guarantees precision
    assert got <= want


def test_simhash_planted(ray_session, docs_df):
    import ray.data
    from cartwright_ray.stages.dedup import simhash_dedup
    df = docs_df.head(100).copy()
    near = df.head(10).copy()
    near["doc_id"] = near["doc_id"] + 10_000
    test_df = pd.concat([df, near])   # identical text → hamming 0
    out = simhash_dedup(ray.data.from_pandas(test_df).repartition(4),
                        max_hamming=3).to_pandas()
    planted = set(near["doc_id"])
    assert planted <= set(out["dup_id"])
    assert (out[out["dup_id"].isin(planted)]["hamming"] == 0).all()


def test_embedding_near_dups_planted(ray_session):
    import ray.data
    from cartwright_ray.stages.dedup import embedding_near_dups
    rng = np.random.default_rng(3)
    base = rng.normal(size=(50, 32))
    dup = base[:5] + rng.normal(0, 0.01, (5, 32))   # cosine ≈ 1
    vecs = np.vstack([base, dup])
    df = pd.DataFrame({"vec_id": np.arange(55),
                       "embedding": [v.tolist() for v in vecs]})
    out = embedding_near_dups(ray.data.from_pandas(df).repartition(2),
                              threshold=0.95).to_pandas()
    assert set(range(50, 55)) <= set(out["dup_id"])


def test_text_stats_matches_pandas(ray_session, docs_df):
    import ray.data
    from cartwright_ray.stages.textstats import text_stats
    out = text_stats(ray.data.from_pandas(docs_df.head(50))).to_pandas()
    for _, r in out.iterrows():
        t = r["text"]
        assert r["n_chars_m"] == len(t)
        assert r["n_tokens"] == len([w for w in t.split() if w])
        assert r["alpha_chars"] == sum(c.isalpha() and c.isascii() for c in t)


def test_langid_sentences(ray_session):
    import ray.data
    from cartwright_ray.stages.textstats import detect_language
    df = pd.DataFrame({"text": [
        "the quick brown fox jumps over the lazy dog and it was good",
        "le chat est dans la maison et il y a du pain pour tout le monde",
        "el perro está en la casa y es un buen día para todos los niños",
        "der Hund ist in dem Haus und das ist ein guter Tag für alle",
        "这是一个中文句子用来测试语言识别",
    ]})
    out = detect_language(ray.data.from_pandas(df), concurrency=1).to_pandas()
    assert out["lang_pred"].tolist() == ["en", "fr", "es", "de", "zh"]


def test_fingerprint_stability(ray_session, docs_df):
    import ray.data
    from cartwright_ray.stages.textstats import fingerprint
    a = fingerprint(ray.data.from_pandas(docs_df.head(30))).to_pandas()
    b = fingerprint(ray.data.from_pandas(docs_df.head(30))).to_pandas()
    assert a["fingerprint"].tolist() == b["fingerprint"].tolist()
    # near-identical docs share fingerprints more than random ones
    assert a["fingerprint"].nunique() >= 25


def test_ann_exact_vs_numpy(ray_session):
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.ann import ann_search
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    queries = {"query_id": [0, 1], "vec": V[:2]}
    out = ann_search(ray.data.from_pandas(emb).repartition(4), queries,
                     k=5).to_pandas()
    sims = np.round(Vn[:2] @ Vn.T, 6)
    for qi in (0, 1):
        order = np.lexsort((emb["vec_id"].values, -sims[qi]))[:5]
        want = emb["vec_id"].values[order].tolist()
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == want


def test_lsh_ann_recall(ray_session):
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.ann import ann_search, lsh_ann_search
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    queries = {"query_id": [0, 1, 2], "vec": V[:3]}
    ds = ray.data.from_pandas(emb).repartition(2)
    exact = ann_search(ds, queries, k=10).to_pandas()
    approx = lsh_ann_search(ds, queries, k=10).to_pandas()
    recalls = []
    for qi in (0, 1, 2):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.3   # approximate path trades recall for scan cost


def test_media_pipeline(ray_session):
    import ray.data
    from cartwright_ray.sources.synth import interleave_documents
    from cartwright_ray.stages.media import (MediaFeatureExtractor,
                                             extract_media_features,
                                             media_rows_from_corpus)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"]).limit(100)
    media = media_rows_from_corpus(interleave_documents(docs))
    out = extract_media_features(media, decoder="fake",
                                 concurrency=1).to_pandas()
    assert len(out) > 0
    assert all(len(f) == 64 for f in out["feature"])
    assert "payload" not in out.columns   # wide bytes dropped after decode
    # the honest default refuses to pretend it can decode
    stub = MediaFeatureExtractor(decoder="stub")
    with pytest.raises(NotImplementedError):
        stub._decode_real(b"bytes")


def test_media_resize_and_frames(ray_session):
    import ray.data
    from cartwright_ray.sources.synth import interleave_documents
    from cartwright_ray.stages.media import (FrameSampler, MediaResize,
                                             media_rows_from_corpus)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"]).limit(40)
    media = media_rows_from_corpus(interleave_documents(docs))
    resized = media.map_batches(MediaResize,
                                fn_constructor_kwargs={"decoder": "fake"},
                                batch_format="pyarrow", batch_size=32,
                                concurrency=1).to_pandas()
    if len(resized):
        assert (resized["width"] == 8).all()
        assert all(len(p) == 64 for p in resized["payload"])
    frames = media.map_batches(FrameSampler,
                               fn_constructor_kwargs={"decoder": "fake"},
                               batch_format="pyarrow", batch_size=32,
                               concurrency=1).to_pandas()
    if len(frames):
        assert set(frames["frame_idx"]) == {0, 4, 8, 12}


def test_audio_pipeline_real_wav(ray_session):
    """End-to-end audio path: real RIFF/WAVE payloads decoded by the
    actor stage, features matching the synth-spec arithmetic exactly."""
    import ray.data
    from cartwright_ray.sources.synth import interleave_documents
    from cartwright_ray.stages.media import (extract_audio_features,
                                             media_rows_from_corpus,
                                             synth_wav_params)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"]).limit(100)
    media = media_rows_from_corpus(interleave_documents(docs),
                                   payload_kind="wav")
    out = extract_audio_features(media, concurrency=1).to_pandas()
    assert len(out) > 0
    assert "payload" not in out.columns
    assert (out["media_type"] == "audio").all()
    for _, row in out.iterrows():
        p = synth_wav_params(int(row["doc_id"]))
        assert row["n_samples"] == p["n_samples"]
        assert row["sample_rate"] == p["sample_rate"]
        assert row["n_channels"] == p["n_channels"]
        assert row["peak"] == p["amplitude"]
        assert row["duration_ms"] == p["n_samples"] * 1000 // 8000
        assert row["n_zero_crossings"] \
            == (p["n_samples"] - 1) // (p["period"] // 2)


def test_register_detector():
    from cartwright_ray.detectors.registry import (Detector, REGISTRY,
                                                   register_detector,
                                                   unregister_detector)
    from cartwright_ray.detectors.cascade import classify_series
    n0 = len(REGISTRY)
    det = Detector(label="hexcolor", kind="misc",
                   count_fn=lambda s, ctx: sum(
                       1 for v in s if str(v).startswith("#")
                       and len(str(v)) == 7))
    det.kind = "geo"; det.subcategory = "hexcolor"  # piggyback result shape
    register_detector(det, priority_before="latitude")
    try:
        res = classify_series(["#a1b2c3", "#ffffff", "#000000"])
        assert res["subcategory"] == "hexcolor"
    finally:
        unregister_detector("hexcolor")
    assert len(REGISTRY) == n0


def test_ivf_ann_matches_probe_restricted_bruteforce(ray_session):
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.ann import (ivf_ann_search, ivf_assign,
                                           ivf_centroids)
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    queries = {"query_id": [0, 1, 2], "vec": V[:3]}
    out = ivf_ann_search(ray.data.from_pandas(emb).repartition(4), queries,
                         k=5, nlist=8, nprobe=3).to_pandas()
    cents = ivf_centroids(V.shape[1], 8)
    assign = ivf_assign(Vn, cents)
    qsims = np.round(Vn[:3] @ cents.T, 9)
    for qi in (0, 1, 2):
        probe = set(np.argsort(-qsims[qi], kind="stable")[:3].tolist())
        mask = np.isin(assign, list(probe))
        sims = np.round(Vn[qi] @ Vn[mask].T, 6)
        ids = emb["vec_id"].values[mask]
        order = np.lexsort((ids, -sims))[:5]
        want = ids[order].tolist()
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == want


def test_ivf_ann_recall_vs_exact(ray_session):
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.ann import ann_search, ivf_ann_search
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    queries = {"query_id": [0, 1, 2], "vec": V[:3]}
    ds = ray.data.from_pandas(emb).repartition(2)
    exact = ann_search(ds, queries, k=10).to_pandas()
    approx = ivf_ann_search(ds, queries, k=10, nlist=16, nprobe=4).to_pandas()
    recalls = []
    for qi in (0, 1, 2):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # the query vector itself always lands in a probed list -> top-1 exact
    for qi in (0, 1, 2):
        top = approx[(approx["query_id"] == qi)
                     & (approx["rank"] == 0)]["vec_id"].iloc[0]
        assert top == qi
    assert np.mean(recalls) >= 0.2   # nprobe/nlist = 1/4 scan fraction


def test_ngram_jaccard_planted_near_clones(ray_session):
    import ray.data
    from cartwright_ray.pipelines.derived import planted_near_clone_docs
    from cartwright_ray.stages.dedup import ngram_jaccard_dedup
    ds = planted_near_clone_docs(SF, clones=10)
    out = ngram_jaccard_dedup(ds, threshold=0.8).to_pandas()
    got = sorted(zip(out["kept_id"].astype(int), out["dup_id"].astype(int)))
    assert got == [(i, i + 100000) for i in range(10)]
    assert (out["jac"] >= 0.8).all() and (out["jac"] < 1.0).all()


def test_token_count_matches_re(ray_session, docs_df):
    import re

    import ray.data
    from cartwright_ray.stages.textstats import (BPE_SPLIT_PATTERN,
                                                 token_count)
    sub = docs_df.head(200)
    out = token_count(ray.data.from_pandas(sub).repartition(3)).to_pandas()
    pat = re.compile(BPE_SPLIT_PATTERN)
    want = {int(r["doc_id"]): len(pat.findall(r["text"]))
            for _, r in sub.iterrows()}
    got = dict(zip(out["doc_id"].astype(int), out["bpe_tokens"].astype(int)))
    assert got == want


def test_media_png_pipeline_end_to_end(ray_session):
    """Real PNG payloads through the real decoder: features equal the
    hash-payload fake path by construction (same seeded pixels), and the
    resize stage re-emits decodable PNGs with correct dimensions."""
    import ray.data

    from cartwright_ray.media.png import png_decode
    from cartwright_ray.sources.synth import synth_corpus
    from cartwright_ray.stages.media import (MediaResize,
                                             extract_media_features,
                                             media_rows_from_corpus)
    corpus = synth_corpus(60, parallelism=2)
    png_rows = media_rows_from_corpus(corpus, payload_kind="png")
    hash_rows = media_rows_from_corpus(corpus, payload_kind="hash")
    f_png = extract_media_features(png_rows, decoder="png").to_pandas()
    f_hash = extract_media_features(hash_rows, decoder="fake").to_pandas()
    assert len(f_png) == len(f_hash) > 0
    key = ["doc_id", "span_idx"]
    f_png = f_png.sort_values(key).reset_index(drop=True)
    f_hash = f_hash.sort_values(key).reset_index(drop=True)
    for a, b in zip(f_png["feature"], f_hash["feature"]):
        assert np.allclose(a, b, atol=1e-6)

    resized = media_rows_from_corpus(corpus, payload_kind="png").map_batches(
        MediaResize, fn_constructor_kwargs={"decoder": "png", "out_size": 8},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 2)).to_pandas()
    assert len(resized)
    for p, w, h in zip(resized["payload"], resized["width"],
                       resized["height"]):
        img = png_decode(bytes(p))
        assert img.shape == (h, w) == (8, 8)


def test_drop_near_dups(ray_session):
    import ray.data
    from cartwright_ray.pipelines.derived import planted_near_clone_docs
    from cartwright_ray.stages.dedup import drop_near_dups, ngram_jaccard_dedup
    ds = planted_near_clone_docs(SF, clones=10)
    pairs = ngram_jaccard_dedup(ds, threshold=0.8)
    kept = drop_near_dups(planted_near_clone_docs(SF, clones=10),
                          pairs).to_pandas()
    n_docs = ds.count()
    assert len(kept) == n_docs - 10                    # all clones dropped
    assert not (kept["doc_id"] >= 100000).any()        # originals kept


def test_langid_new_languages(ray_session):
    import ray.data
    from cartwright_ray.stages.textstats import detect_language
    df = pd.DataFrame({"text": [
        "o problema não foi como ele pensava em um dia mais quente",
        "il problema non era come questo ma anche della nostra vita",
        "ik denk dat het een goed idee is maar ook niet voor iedereen",
        "the quick brown fox jumps over the lazy dog in this field",
    ]})
    out = detect_language(ray.data.from_pandas(df)).to_pandas()
    assert out["lang_pred"].tolist() == ["pt", "it", "nl", "en"]


def test_exact_dedup_shuffle_plan_matches_broadcast(ray_session, docs_df):
    """The hash-partitioned plan (VERDICT r02 Next #4) must keep exactly
    the same survivors as the broadcast plan — and must never collect ids
    to the driver (to_pandas/materialize are poisoned during both build
    AND execution of the shuffle path)."""
    import ray.data
    from ray.data import Dataset

    from cartwright_ray.stages.dedup import exact_dedup

    df = docs_df.head(120).copy()
    clones = df.head(30).copy()
    clones["doc_id"] = clones["doc_id"] + 10_000
    test_df = pd.concat([df, clones])
    ds = ray.data.from_pandas(test_df).repartition(4)

    want = sorted(exact_dedup(ds, plan="broadcast").to_pandas()["doc_id"])

    real_to_pandas = Dataset.to_pandas
    real_materialize = Dataset.materialize

    def _poisoned(self, *a, **k):
        raise AssertionError("driver-side materialization on shuffle path")

    Dataset.to_pandas = _poisoned
    Dataset.materialize = _poisoned
    try:
        shuffled = exact_dedup(ds, plan="shuffle")
        got = sorted(r["doc_id"] for r in shuffled.iter_rows())
    finally:
        Dataset.to_pandas = real_to_pandas
        Dataset.materialize = real_materialize
    assert got == want


def test_drop_near_dups_shuffle_plan_matches_broadcast(ray_session):
    import ray.data
    from ray.data import Dataset

    from cartwright_ray.pipelines.derived import planted_near_clone_docs
    from cartwright_ray.stages.dedup import drop_near_dups, ngram_jaccard_dedup

    pairs = ngram_jaccard_dedup(planted_near_clone_docs(SF, clones=10),
                                threshold=0.8).materialize()
    corpus = planted_near_clone_docs(SF, clones=10)
    want = sorted(drop_near_dups(corpus, pairs,
                                 plan="broadcast").to_pandas()["doc_id"])

    real_to_pandas = Dataset.to_pandas
    real_materialize = Dataset.materialize

    def _poisoned(self, *a, **k):
        raise AssertionError("driver-side materialization on shuffle path")

    Dataset.to_pandas = _poisoned
    Dataset.materialize = _poisoned
    try:
        kept = drop_near_dups(corpus, pairs, plan="shuffle",
                              num_partitions=16)
        got = sorted(r["doc_id"] for r in kept.iter_rows())
    finally:
        Dataset.to_pandas = real_to_pandas
        Dataset.materialize = real_materialize
    assert got == want
    assert len(got) and not any(g >= 100000 for g in got)


def test_pairwise_exact_jaccard_matches_set_kernel():
    """The vectorized pair kernel is value-identical to
    jaccard(_shingle_set(a), _shingle_set(b)) — same sets, same int/int
    division."""
    import numpy as np

    from cartwright_ray.stages.dedup import (_pairwise_exact_jaccard,
                                             _shingle_set, jaccard)

    a = ["the quick brown fox jumps", "aaaa", "", "short", "xyzw" * 50,
         "the quick brown fox jumps over the lazy dog"]
    b = ["the quick brown fox jumped", "aaab", "", "shore", "xyzw" * 49,
         "a completely different sentence entirely"]
    got = _pairwise_exact_jaccard(a, b, 4)
    want = np.array([jaccard(_shingle_set(x, 4), _shingle_set(y, 4))
                     for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, want)


def test_exact_verify_shuffle_plan_no_driver_collect(ray_session):
    """VERDICT r03 Next #1: above the pair bound the verify stage must
    run with ZERO driver-side collection — texts attach via keyed
    shuffles and the jaccard verify is in-batch. Poisoned to_pandas
    proves it; results must equal the broadcast plan's."""
    import ray.data
    from ray.data import Dataset

    from cartwright_ray.pipelines.derived import planted_near_clone_docs
    from cartwright_ray.stages.dedup import (_exact_verify_pairs,
                                             minhash_lsh_dedup)

    corpus = planted_near_clone_docs(SF, clones=10).materialize()
    cand = minhash_lsh_dedup(corpus, threshold=0.8,
                             verify="estimate").materialize()
    assert cand.count() > 0
    want = _exact_verify_pairs(corpus, cand, "text", "doc_id", 0.8, 4) \
        .to_pandas().sort_values("dup_id").reset_index(drop=True)

    real_to_pandas = Dataset.to_pandas

    def _poisoned(self, *a, **k):
        raise AssertionError("driver-side collect on the shuffle "
                             "verify path")

    Dataset.to_pandas = _poisoned
    try:
        out = _exact_verify_pairs(corpus, cand, "text", "doc_id", 0.8, 4,
                                  pair_limit=0)
        rows = sorted(((r["dup_id"], r["kept_id"], r["jac"])
                       for r in out.iter_rows()))
    finally:
        Dataset.to_pandas = real_to_pandas
    assert rows == sorted(zip(want["dup_id"], want["kept_id"], want["jac"]))
    assert len(rows) == 10


def test_vecs_from_arrow_sliced_plain_list():
    """Regression (ADVICE r02): a sliced NON-chunked ListArray must not
    double-apply the slice offset."""
    import pyarrow as pa

    from cartwright_ray.stages.dedup import _shingle_hashes  # noqa: F401
    from cartwright_ray.stages.ann import _vecs_from_arrow

    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
    sl = arr.slice(1, 2)
    out = _vecs_from_arrow(sl)
    assert out.shape == (2, 2)
    assert (out == np.array([[3.0, 4.0], [5.0, 6.0]])).all()


def test_ivf_partitioned_write_and_pruned_read(ray_session, tmp_path):
    """ivf_partition_write + ivf_ann_search_partitioned (VERDICT r02
    Next #7): the pruned read must open ONLY the probed ivf_list
    partitions and return the same top-k as the streaming-filter path."""
    import os

    import ray.data

    from cartwright_ray.stages.ann import (ivf_ann_search,
                                           ivf_ann_search_partitioned,
                                           ivf_centroids,
                                           ivf_partition_write)

    rng = np.random.default_rng(41)
    n, d, nlist, nprobe = 600, 16, 8, 2
    vecs = rng.normal(size=(n, d))
    df = pd.DataFrame({"vec_id": np.arange(n)})
    df["embedding"] = [v for v in vecs.astype(np.float64)]
    ds = ray.data.from_pandas(df).repartition(4)

    queries = {"query_id": [0, 1, 2], "vec": vecs[:3] + 0.01}

    path = str(tmp_path / "ivf_corpus")
    ivf_partition_write(ds, path, nlist=nlist)
    part_dirs = sorted(p for p in os.listdir(path)
                       if p.startswith("ivf_list="))
    assert len(part_dirs) == nlist          # all lists populated

    out = ivf_ann_search_partitioned(
        path, queries, k=5, nlist=nlist, nprobe=nprobe).to_pandas()
    want = ivf_ann_search(ds, queries, k=5, nlist=nlist,
                          nprobe=nprobe).to_pandas()
    key = ["query_id", "rank"]
    out = out.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert out["vec_id"].tolist() == want["vec_id"].tolist()
    assert np.allclose(out["score"], want["score"])

    # the prune is at the reader: the probed union is < nlist dirs and the
    # Dataset's input files live only under those dirs
    qmat = np.asarray(queries["vec"], dtype=np.float64)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    cents = ivf_centroids(d, nlist)
    probe = np.argsort(-np.round(qn @ cents.T, 9), axis=1,
                       kind="stable")[:, :nprobe]
    probed = {f"ivf_list={c}" for c in np.unique(probe)}
    assert len(probed) < nlist
    probed_files = [os.path.join(path, d, f)
                    for d in sorted(probed)
                    for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")]
    pruned_ds = ray.data.read_parquet(probed_files)
    for f in pruned_ds.input_files():
        assert any(p in f for p in probed)
    n_probed_rows = pruned_ds.count()
    assert n_probed_rows < n                 # a real fraction was skipped


def test_connected_components_chain_and_bridge(ray_session):
    """A 4-chain (0-1, 1-2, 2-3), a bridge doc joining two chains
    (10-11, 12-13, 11-12), and an isolated pair — every node labelled
    with its component minimum, including the roots themselves."""
    import ray
    from cartwright_ray.stages.dedup import connected_components

    pairs = pd.DataFrame({
        "dup_id":  [1, 2, 3, 11, 13, 12, 21],
        "kept_id": [0, 1, 2, 10, 12, 11, 20],
    })
    want = {0: 0, 1: 0, 2: 0, 3: 0,
            10: 10, 11: 10, 12: 10, 13: 10,
            20: 20, 21: 20}
    for limit in (2_000_000, 0):      # driver fast path AND star rounds
        out = (connected_components(
                   ray.data.from_pandas(pairs).repartition(3),
                   driver_limit=limit)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got == want, limit


def test_connected_components_vs_union_find(ray_session):
    """Random sparse graph: the distributed large-star/small-star result
    must equal a driver-side union-find over the same edges."""
    import ray
    from cartwright_ray.stages.dedup import connected_components

    rng = np.random.default_rng(11)
    n = 400
    u = rng.integers(0, n, 300)
    v = rng.integers(0, n, 300)
    pairs = pd.DataFrame({"dup_id": u, "kept_id": v})

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(u.tolist(), v.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component, only for nodes that appear in an edge
    touched = sorted({x for x in u.tolist() + v.tolist()
                      if any(True for _ in [0])})
    # exclude self-loop-only nodes (connected_components drops self loops)
    non_self = {a for a, b in zip(u.tolist(), v.tolist()) if a != b}
    non_self |= {b for a, b in zip(u.tolist(), v.tolist()) if a != b}
    want = {x: find(x) for x in sorted(non_self)}
    # a union-find root found via path-halving is the min label because
    # unions always point the larger root at the smaller one
    for limit in (2_000_000, 0):      # driver fast path AND star rounds
        out = (connected_components(
                   ray.data.from_pandas(pairs).repartition(4),
                   driver_limit=limit).to_pandas())
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got == want, limit


def test_near_dup_clusters_transitive_chain(ray_session):
    """A~B and B~C near-dups (but A!~C directly) must land in ONE cluster —
    the semantics pairwise dedup cannot express."""
    import ray
    from cartwright_ray.stages.dedup import near_dup_clusters

    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders far across the wide green summer valley meadow")
    toks = base.split()
    a = " ".join(toks)
    b = " ".join(toks[:-1] + ["creek"])          # ~1 token off A
    c = " ".join(toks[:-2] + ["brook", "creek"])  # ~1 token off B, 2 off A
    rng = np.random.default_rng(5)
    filler = [" ".join(f"w{x}" for x in rng.integers(0, 10**9, 25))
              for _ in range(20)]
    df = pd.DataFrame({
        "doc_id": list(range(100, 100 + len(filler))) + [1, 2, 3],
        "text": filler + [a, b, c],
    })
    out = (near_dup_clusters(ray.data.from_pandas(df).repartition(3),
                             threshold=0.75)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("plan", ["broadcast", "shuffle"])
def test_exact_dedup_nul_bytes_not_merged(ray_session, plan):
    """pd.util.hash_array hashes C-strings (truncates at NUL): texts
    differing only AFTER an embedded NUL must still be distinct — the
    injective escape in _content_hash128 pins this."""
    import pyarrow as pa
    import ray.data
    from cartwright_ray.stages.dedup import exact_dedup
    tbl = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["x\x00y", "x\x00z", "x\x00y", "x\x01\x03y", "plain"]})
    out = exact_dedup(ray.data.from_arrow(tbl), plan=plan).to_pandas()
    # doc 3 is the only true duplicate (of doc 1); the escape itself is
    # injective, so a literal "x\x01\x03y" does not collide with "x\x00y"
    assert sorted(out["doc_id"]) == [1, 2, 4, 5]


def test_hamming_ann_vs_numpy(ray_session):
    """Packed-bit engine path vs a direct per-dimension sign-compare."""
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.ann import hamming_ann_search, sign_quantize

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    queries = {"query_id": [0, 1], "vec": V[:2]}
    out = hamming_ann_search(ray.data.from_pandas(emb).repartition(4),
                             queries, k=5).to_pandas()
    signs = V >= 0
    ids = emb["vec_id"].values
    for qi in (0, 1):
        ham = (signs != signs[qi]).sum(axis=1)
        order = np.lexsort((ids, ham))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert got["vec_id"].tolist() == ids[order].tolist()
        assert got["hamming"].tolist() == ham[order].tolist()
    # packing is invertible on the sign pattern: d=64 -> one word
    sig = sign_quantize(V[:8])
    assert sig.shape == (8, 1)
    assert len({s.tobytes() for s in sig}) == 8   # distinct patterns


def test_gopher_quality_filter_rules(ray_session):
    import pyarrow as pa
    import ray.data
    from cartwright_ray.stages.textstats import gopher_quality_filter

    docs = pa.table({"doc_id": [1, 2, 3, 4], "text": [
        "the brown cat jumped over the garden wall and it was quite good",  # keep
        "short text",                                    # fails len + stop
        "the " + "supercalifragilistic " * 20 + "and a", # fails mwl
        "the quick brown fox !!! ??? *** $$$ and a is",  # fails punct
    ]})
    out = gopher_quality_filter(ray.data.from_arrow(docs), min_words=5,
                                max_words=60, min_stop_hits=3,
                                max_punct_per_word=0).to_pandas() \
        .sort_values("doc_id")
    assert out["keep"].tolist() == [1, 0, 0, 0]
    assert out["rule_len"].tolist() == [1, 0, 1, 1]
    assert out["rule_mwl"].tolist() == [1, 1, 0, 1]
    assert out["rule_punct"].tolist() == [1, 1, 1, 0]


def test_chunk_tokens_windows_and_text(ray_session):
    import pyarrow as pa
    import ray.data
    from cartwright_ray.stages.chunking import chunk_tokens

    docs = pa.table({"doc_id": [1, 2, 3, 4], "text": [
        "a b c d e f g h i j",      # 10 tokens → chunks at 0,4,8
        "one two",                   # shorter than size → 1 chunk
        "  x   y  z ",               # ragged whitespace
        "p q r s t u v w",           # exactly size+stride boundary
    ]})
    out = chunk_tokens(ray.data.from_arrow(docs), size=6, stride=4) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    # 10 tokens, size 6, stride 4: k = 1 + ceil((10-6)/4) = 2 — the
    # second window (tokens 4..9) completes coverage, no window at 8
    d1 = out[out["doc_id"] == 1]
    assert d1["tok_start"].tolist() == [0, 4]
    assert d1["chunk_text"].tolist() == ["a b c d e f", "e f g h i j"]
    assert d1["n_chunk_tokens"].tolist() == [6, 6]
    d2 = out[out["doc_id"] == 2]
    assert d2["chunk_text"].tolist() == ["one two"]
    d3 = out[out["doc_id"] == 3]
    assert d3["chunk_text"].tolist() == ["x y z"]
    d4 = out[out["doc_id"] == 4]    # 8 tokens: windows at 0 and 4
    assert d4["chunk_text"].tolist() == ["p q r s t u", "t u v w"]
    assert d4["n_chunk_tokens"].tolist() == [6, 4]


def test_normalize_text_rules(ray_session):
    import pyarrow as pa
    import ray.data
    from cartwright_ray.stages.textstats import normalize_text

    docs = pa.table({"doc_id": [1, 2],
                     "text": ["  Hello\t\tWORLD \n again ", "a  b"]})
    out = normalize_text(ray.data.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id")
    assert out["text_norm"].tolist() == ["hello world again", "a b"]
    assert out["n_chars_norm"].tolist() == [17, 3]


def test_vocab_coverage_counts(ray_session):
    import pyarrow as pa
    import ray.data
    from cartwright_ray.stages.textstats import vocab_coverage

    docs = pa.table({"doc_id": [1, 2],
                     "text": ["the cat SAT", "dog the zebra unknown"]})
    out = vocab_coverage(ray.data.from_arrow(docs),
                         {"the", "cat", "sat", "dog"}).to_pandas() \
        .sort_values("doc_id")
    assert out["n_tokens"].tolist() == [3, 4]
    assert out["n_oov"].tolist() == [0, 2]      # zebra, unknown


def test_matryoshka_ann_matches_prefix_bruteforce(ray_session):
    import pyarrow.parquet as pq
    import ray.data
    from cartwright_ray.stages.ann import matryoshka_ann_search

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)[:, :16]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    queries = {"query_id": [0, 1],
               "vec": np.asarray(emb["embedding"].tolist(),
                                 dtype=np.float64)[:2]}
    out = matryoshka_ann_search(ray.data.from_pandas(emb).repartition(4),
                                queries, k=5, dims=16).to_pandas()
    sims = np.round(Vn[:2] @ Vn.T, 6)
    ids = emb["vec_id"].values
    for qi in (0, 1):
        order = np.lexsort((ids, -sims[qi]))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert got["vec_id"].tolist() == ids[order].tolist()


def test_sq8_ann_matches_brute_two_stage():
    """SQ8 two-stage ANN: numpy replay of the quantizer + integer
    shortlist + exact rerank; layout-invariant; shortlist ⊇ top-k when
    quantization is faithful on well-separated data."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.ann import _sq8_encode, sq8_ann_search

    rng = np.random.default_rng(3)
    n, d, k, sl = 400, 24, 5, 40
    x = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(x)})
    qids = [0, 1]
    qv = x[:2].astype(np.float64)

    xf = x.astype(np.float64)
    mn, mx = xf.min(axis=0), xf.max(axis=0)
    codes = _sq8_encode(xf, mn, mx - mn)
    qcodes = _sq8_encode(qv, mn, mx - mn)
    want_rows = []
    for qi, qid in enumerate(qids):
        approx = qcodes[qi] @ codes.T
        short = np.lexsort((np.arange(n), -approx))[:sl]
        qn = qv[qi] / np.linalg.norm(qv[qi])
        xn = xf[short] / np.linalg.norm(xf[short], axis=1,
                                        keepdims=True)
        sims = np.round(xn @ qn, 6)
        order = np.lexsort((short, -sims))[:k]
        for r, oi in enumerate(order):
            want_rows.append((qid, int(short[oi]), r,
                              float(sims[oi])))
    want = pd.DataFrame(want_rows, columns=["query_id", "vec_id",
                                            "rank", "score"])

    for blocks in (1, 5):
        got = sq8_ann_search(
            ray.data.from_pandas(df).repartition(blocks),
            {"query_id": qids, "vec": qv}, k=k, shortlist=sl) \
            .to_pandas()[["query_id", "vec_id", "rank", "score"]] \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # each query's own vector is its nearest neighbor
    top0 = want[(want.query_id == 0) & (want["rank"] == 0)]
    assert int(top0.vec_id.iloc[0]) == 0
