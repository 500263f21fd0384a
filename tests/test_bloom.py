"""Bloom-filter semi-join (stages/bloom.py): filter math + exact-join
equivalence. The filter's contract is NO false negatives and a bounded
false-positive rate; the semi-join's contract is exactness (the Bloom
pass is a volume optimization only)."""

import numpy as np
import pyarrow as pa
import pytest

from cartwright_ray.stages.bloom import (
    _set_bits, _test_bits, bloom_build, bloom_params, bloom_semi_join,
)


def test_bloom_params_shape():
    m, k = bloom_params(10_000, fpr=0.01)
    assert m % 64 == 0
    assert m > 10_000          # ~9.6 bits/key at 1% FPR
    assert 5 <= k <= 10        # optimum is ~6.6


def test_no_false_negatives_and_fpr_bound():
    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=5_000, replace=False)
    m, k = bloom_params(len(members), fpr=0.01)
    words = np.zeros(m // 64, dtype=np.uint64)
    _set_bits(words, members, m, k)
    assert _test_bits(words, members, m, k).all()   # no false negatives
    outsiders = np.setdiff1d(
        rng.choice(10_000_000, size=50_000, replace=False), members)
    fpr = _test_bits(words, outsiders, m, k).mean()
    assert fpr < 0.03          # 3x slack over the 1% design point


def test_string_keys_supported():
    keys = np.array([f"doc-{i}" for i in range(1000)], dtype=object)
    m, k = bloom_params(len(keys), fpr=0.01)
    words = np.zeros(m // 64, dtype=np.uint64)
    _set_bits(words, keys, m, k)
    assert _test_bits(words, keys, m, k).all()
    other = np.array([f"other-{i}" for i in range(5000)], dtype=object)
    assert _test_bits(words, other, m, k).mean() < 0.03


def test_partial_bitmaps_or_merge_is_exact():
    """Bloom(A ∪ B) == Bloom(A) | Bloom(B) — the property the per-block
    partial build relies on."""
    rng = np.random.default_rng(11)
    a = rng.choice(1_000_000, size=2_000, replace=False)
    b = rng.choice(1_000_000, size=2_000, replace=False)
    m, k = bloom_params(len(a) + len(b), fpr=0.01)
    wa = np.zeros(m // 64, dtype=np.uint64)
    wb = np.zeros(m // 64, dtype=np.uint64)
    wu = np.zeros(m // 64, dtype=np.uint64)
    _set_bits(wa, a, m, k)
    _set_bits(wb, b, m, k)
    _set_bits(wu, np.concatenate([a, b]), m, k)
    assert np.array_equal(wa | wb, wu)


def test_bloom_build_matches_single_pass(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    keys = rng.choice(1_000_000, size=4_000, replace=False)
    ds = ray.data.from_arrow(pa.table({"id": keys})).repartition(8)
    words, m, k = bloom_build(ds, "id", expected_keys=len(keys), fpr=0.01)
    ref = np.zeros(m // 64, dtype=np.uint64)
    _set_bits(ref, keys, m, k)
    assert np.array_equal(words, ref)


@pytest.mark.parametrize("overlap", [0.0, 0.3, 1.0])
def test_bloom_semi_join_is_exact(ray_session, overlap):
    import ray.data

    rng = np.random.default_rng(int(overlap * 10) + 1)
    large_keys = rng.integers(0, 5_000, size=20_000)
    n_small = 400
    in_set = rng.choice(np.unique(large_keys),
                        size=int(n_small * overlap), replace=False)
    out_set = rng.choice(np.arange(10_000, 20_000),
                         size=n_small - len(in_set), replace=False)
    small_keys = np.concatenate([in_set, out_set])
    large = ray.data.from_arrow(pa.table({
        "k": large_keys,
        "payload": np.arange(len(large_keys), dtype=np.int64),
    })).repartition(6)
    small = ray.data.from_arrow(
        pa.table({"sk": small_keys})).repartition(3)

    got = bloom_semi_join(large, small, "k", "sk").to_pandas()

    want_mask = np.isin(large_keys, small_keys)
    if not want_mask.any():
        # Ray's to_pandas drops the schema when every block is empty
        # (even schema-carrying empty tables) — zero rows is the contract
        assert len(got) == 0
        return
    got = got.sort_values(["k", "payload"]).reset_index(drop=True)
    import pandas as pd
    want = pd.DataFrame({
        "k": large_keys[want_mask],
        "payload": np.arange(len(large_keys), dtype=np.int64)[want_mask],
    }).sort_values(["k", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
