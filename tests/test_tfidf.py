"""TF-IDF and inverted-index operator tests."""

import collections
import math
import os
import re

import numpy as np
import pandas as pd
import pytest


DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "text": ["cat dog cat", "dog fish", "cat cat cat bird", ""],
})


def _reference_tfidf(top=2):
    tf = collections.defaultdict(collections.Counter)
    for _, r in DOCS.iterrows():
        for tok in re.split(r"\s+", r["text"]):
            if tok:
                tf[r["doc_id"]][tok] += 1
    df = collections.Counter()
    for d in tf.values():
        for tok in d:
            df[tok] += 1
    n = len(DOCS)
    out = {}
    for doc, counts in tf.items():
        scored = sorted(
            ((-c * math.log(n / df[t]), t, c) for t, c in counts.items()))
        out[doc] = [(t, c, -s) for s, t, c in scored[:top]]
    return out


def test_tfidf_matches_reference(ray_session):
    import ray
    from cartwright_ray.stages.tfidf import tfidf_top_terms

    out = tfidf_top_terms(ray.data.from_pandas(DOCS).repartition(2),
                          top_per_doc=2).to_pandas()
    want = _reference_tfidf(top=2)
    for doc, terms in want.items():
        got = out[out["doc_id"] == doc].sort_values("term_rank")
        assert list(got["token"]) == [t for t, _, _ in terms]
        assert list(got["tf"]) == [c for _, c, _ in terms]
        for g, (_, _, s) in zip(got["score"], terms):
            assert abs(g - s) < 1e-5
    assert (out["doc_id"] != 3).all()      # empty doc emits nothing


def test_tfidf_vocab_cap(ray_session):
    import ray
    from cartwright_ray.stages.tfidf import tfidf_top_terms

    out = tfidf_top_terms(ray.data.from_pandas(DOCS).repartition(2),
                          top_per_doc=3, max_vocab=1).to_pandas()
    # only the most-frequent-df token ('cat' and 'dog' tie at df=2;
    # tie-break by token keeps 'cat') survives the cap
    assert set(out["token"]) == {"cat"}


def test_inverted_index_prunes_buckets(ray_session, tmp_path):
    import ray
    from cartwright_ray.stages.tfidf import (build_inverted_index,
                                             read_postings, token_bucket)

    path = str(tmp_path / "idx")
    build_inverted_index(ray.data.from_pandas(DOCS).repartition(2), path,
                         num_buckets=8)
    # all buckets with postings exist on disk
    on_disk = {d for d in os.listdir(path) if d.startswith("bucket=")}
    want_buckets = {f"bucket={b}" for b in
                    token_bucket(np.array(["cat", "dog", "fish", "bird"],
                                          dtype=object), 8)}
    assert on_disk == want_buckets

    out = read_postings(path, ["cat", "fish"], num_buckets=8).to_pandas()
    got = out.set_index("token")
    assert got.loc["cat", "df"] == 2 and got.loc["cat", "total_tf"] == 5
    assert got.loc["fish", "df"] == 1 and got.loc["fish", "total_tf"] == 1

    # the probe opened only the probed tokens' buckets
    probe_buckets = {f"bucket={b}" for b in
                     token_bucket(np.array(["cat", "fish"], dtype=object),
                                  8)}
    assert probe_buckets <= on_disk
    if probe_buckets < on_disk:
        # at least one bucket was skipped by the reader
        assert len(probe_buckets) < len(on_disk)
