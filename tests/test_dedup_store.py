"""Persisted fingerprint store: write, pruned probe, append workflow."""

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def store_dir():
    d = tempfile.mkdtemp(prefix="fp_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(texts, start=0):
    return pd.DataFrame({"doc_id": np.arange(start, start + len(texts)),
                         "text": texts})


def test_probe_drops_exact_store_matches_only(ray_session, store_dir):
    import ray.data

    from cartwright_ray.stages.dedup_store import (dedup_against_store,
                                                   write_fingerprint_store)

    base = [f"document number {i} body" for i in range(200)]
    write_fingerprint_store(
        ray.data.from_pandas(_docs(base)).repartition(4), store_dir)

    incoming = _docs(base[:50] + [f"fresh {i}" for i in range(30)],
                     start=1000)
    out = dedup_against_store(
        ray.data.from_pandas(incoming).repartition(3),
        store_dir).to_pandas()
    # the 50 exact matches drop; the 30 fresh docs survive with columns
    assert sorted(out["doc_id"]) == list(range(1050, 1080))
    assert out["text"].str.startswith("fresh").all()


def test_store_append_workflow(ray_session, store_dir):
    """Survivors' fingerprints append into the same layout; a re-probe
    of the same batch then drops everything."""
    import ray.data

    from cartwright_ray.stages.dedup_store import (dedup_against_store,
                                                   write_fingerprint_store)

    write_fingerprint_store(
        ray.data.from_pandas(_docs(["a", "b", "c"])), store_dir)
    batch = ray.data.from_pandas(_docs(["b", "x", "y"], start=10))
    survivors = dedup_against_store(batch, store_dir).materialize()
    assert sorted(survivors.to_pandas()["doc_id"]) == [11, 12]
    # append survivors' fingerprints into the layout, then probe at the
    # NEXT generation: the bumped cache key makes warm workers reload
    # the mutated buckets instead of serving the pre-append contents
    write_fingerprint_store(survivors, store_dir)
    again = dedup_against_store(batch, store_dir,
                                generation=1).to_pandas()
    assert len(again) == 0


def test_bucket_cache_byte_bounded_lru(store_dir, monkeypatch):
    """The cache is BYTE-bounded (VERDICT r04: the old 8-entry cap
    thrashed against 64 buckets): many small buckets coexist; once the
    byte budget is hit, the LEAST-recently-used entry goes first."""
    from cartwright_ray.stages import dedup_store as m

    m._BUCKET_CACHE.clear()
    # many empty buckets -> zero bytes -> nothing evicted (no thrash)
    for b in range(200):
        m._load_bucket_pairs(store_dir, b)
    assert len(m._BUCKET_CACHE) == 200
    m._BUCKET_CACHE.clear()
    # force evictions: 16-byte entries against a 64-byte budget
    monkeypatch.setattr(m, "_BUCKET_CACHE_MAX_BYTES", 64)
    monkeypatch.setattr(m, "_BUCKET_CACHE_MIN_ENTRIES", 2)
    for b in range(10):
        m._BUCKET_CACHE[(store_dir, b, 0)] = np.zeros(1, dtype="S16")
    m._BUCKET_CACHE[(store_dir, 0, 0)]        # plain read ≠ LRU touch
    pairs = m._load_bucket_pairs(store_dir, 3, 0)   # hit: touches 3
    assert pairs.nbytes == 16
    m._load_bucket_pairs(store_dir, 99, 0)    # miss: insert + evict
    held = sum(v.nbytes for v in m._BUCKET_CACHE.values())
    assert held <= 64
    # bucket 3 was touched, so it survived the eviction sweep
    assert (store_dir, 3, 0) in m._BUCKET_CACHE
    assert (store_dir, 99, 0) in m._BUCKET_CACHE
    m._BUCKET_CACHE.clear()


def test_bucket_cache_drops_stale_generations(store_dir):
    """Probing a bucket at generation g evicts the same bucket's entries
    at every other generation — they can never be asked for again."""
    from cartwright_ray.stages import dedup_store as m

    m._BUCKET_CACHE.clear()
    m._BUCKET_CACHE[(store_dir, 7, 0)] = np.zeros(4, dtype="S16")
    m._BUCKET_CACHE[(store_dir, 8, 0)] = np.zeros(4, dtype="S16")
    m._load_bucket_pairs(store_dir, 7, generation=1)
    assert (store_dir, 7, 0) not in m._BUCKET_CACHE
    assert (store_dir, 8, 0) in m._BUCKET_CACHE      # other buckets kept
    assert (store_dir, 7, 1) in m._BUCKET_CACHE
    m._BUCKET_CACHE.clear()
