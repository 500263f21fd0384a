"""cooccurrence — brute set-intersection differential at any layout."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.cooccur import cooccurrence


def test_matches_brute():
    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "event_type": rng.choice(list("abcde"), n)})

    sets = df.drop_duplicates().groupby("user_id")["event_type"] \
        .apply(set)
    want = {}
    for s in sets:
        s = sorted(s)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                want[(s[i], s[j])] = want.get((s[i], s[j]), 0) + 1
    want = pd.DataFrame(
        [(a, b, c) for (a, b), c in sorted(want.items())],
        columns=["item_a", "item_b", "n_entities"])

    for blocks in (1, 6):
        got = cooccurrence(
            ray.data.from_pandas(df).repartition(blocks))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_single_item_entities_emit_nothing():
    df = pd.DataFrame({"user_id": [1, 1, 2], "event_type":
                       ["x", "x", "y"]})
    got = cooccurrence(ray.data.from_pandas(df))
    assert len(got) == 0
