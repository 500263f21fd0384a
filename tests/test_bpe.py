"""bpe_train — differential vs a dict-based Sennrich-style reference.

The reference counts pairs over (word → freq) with a plain dict and
applies merges per word with Python str.replace on the same
double-space encoding — semantics the stage docstring claims are
engine-identical. Covers: repeated-symbol overlap (``aaa`` counts two
(a,a) pairs, merges one), tie-breaking on (count desc, left, right),
early stop when no pairs remain, and block-layout invariance.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.bpe import bpe_train


def _ref_bpe(texts, n_merges):
    freq = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    enc = {" " + "  ".join(w) + " ": f for w, f in freq.items()}
    rows = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for s, f in enc.items():
            toks = s.strip().split("  ")
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] = \
                    pairs.get((toks[i], toks[i + 1]), 0) + f
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((step, a, b, a + b, c))
        enc = {s.replace(f" {a}  {b} ", f" {a}{b} "): f
               for s, f in enc.items()}
    return pd.DataFrame(rows, columns=["step", "left_sym", "right_sym",
                                       "merged", "pair_count"])


def test_matches_reference_and_layout_invariant():
    rng = np.random.default_rng(41)
    vocab = ["banana", "bandana", "ban", "anna", "nab", "abba",
             "ababab", "xyz", "x", "yy"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(300)]
    want = _ref_bpe(texts, 8)
    assert len(want) == 8
    df = pd.DataFrame({"text": texts})
    for blocks in (1, 4, 13):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = bpe_train(ds, n_merges=8)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_overlap_counting_and_merge():
    # "aaa"×5: pair (a,a) counts 2 per word = 10; merge once per word
    # (greedy non-overlap) -> "aa a"; next round (aa,a) wins with 5
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["aaa"] * 5}))
    got = bpe_train(ds, n_merges=2)
    assert got.loc[0, ["left_sym", "right_sym", "pair_count"]].tolist() \
        == ["a", "a", 10]
    assert got.loc[1, "merged"] == "aaa" and got.loc[1, "pair_count"] == 5
    assert got.loc[1, "left_sym"] == "aa"    # left-to-right greedy


def test_token_counts_weighted_apply():
    from cartwright_ray.stages.bpe import bpe_token_counts
    texts = ["banana ban", "banana", "nab abba"]
    # reference: train 2 merges, re-encode every word, count × freq
    want_merges = _ref_bpe(texts, 2)
    freq = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    counts = {}
    for w, f in freq.items():
        s = " " + "  ".join(w) + " "
        for _, r in want_merges.iterrows():
            s = s.replace(f" {r.left_sym}  {r.right_sym} ",
                          f" {r.merged} ")
        for tok in s.strip().split("  "):
            counts[tok] = counts.get(tok, 0) + f
    want = (pd.DataFrame(sorted(counts.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:30],
                         columns=["token", "n"]))
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    got = bpe_token_counts(ds, n_merges=2, k=30)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_early_stop_single_chars():
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["a b c", "d e"]}))
    got = bpe_train(ds, n_merges=5)
    assert len(got) == 0                     # no multi-char word: no pair
