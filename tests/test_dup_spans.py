"""duplicate_gram_stats — brute-force differential over synthetic docs
with planted repeated substrings, overlap unions, and sub-n shorts.

The brute oracle builds every word n-gram per doc in Python, counts
corpus-wide occurrences (and distinct-doc occurrences for the
cross_doc_only variant), and unions the flagged fixed-width windows
per doc as an explicit covered-index set — the engine's integer
gaps-and-islands sum must match it exactly at any block layout.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.dup_spans import duplicate_gram_stats


def _brute(docs: dict[str, str], n: int, cross_doc_only: bool):
    grams = {}   # gram -> list[(doc, pos)]
    toks = {}
    for d, text in docs.items():
        words = [w for w in text.lower().split() if w]
        toks[d] = len(words)
        for p in range(len(words) - n + 1):
            g = " ".join(words[p:p + n])
            grams.setdefault(g, []).append((d, p))
    rows = []
    for d in docs:
        flagged = []
        for g, occ in grams.items():
            dup = (len({x[0] for x in occ}) >= 2 if cross_doc_only
                   else len(occ) >= 2)
            if dup:
                flagged.extend(p for (dd, p) in occ if dd == d)
        covered = set()
        for p in flagged:
            covered.update(range(p, p + n))
        rows.append((d, toks[d], len(flagged), len(covered)))
    return (pd.DataFrame(rows, columns=["doc_id", "n_tokens",
                                        "n_dup_grams", "n_dup_tokens"])
            .sort_values("doc_id").reset_index(drop=True))


def _mk_docs(rng, n_docs=40):
    vocab = [f"w{i}" for i in range(30)]
    chunk = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {}
    for i in range(n_docs):
        words = list(rng.choice(vocab, size=int(rng.integers(2, 40))))
        if i % 3 == 0:          # plant the shared substring
            at = int(rng.integers(0, len(words) + 1))
            words[at:at] = chunk.split()
        if i % 7 == 0:          # in-doc self repetition
            words += words[:12]
        docs[f"d{i:03d}"] = " ".join(words)
    docs["short"] = "one two three"          # < n tokens: zeros
    docs["empty"] = ""
    return docs


def test_matches_brute_both_modes_and_layouts():
    rng = np.random.default_rng(17)
    docs = _mk_docs(rng)
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    # layout sweep on the default mode; cross_doc_only once (the mode
    # difference is purely the in-kernel distinct-doc predicate)
    for cross, blocks in ((False, 7), (True, 3)):
        want = _brute(docs, 8, cross)
        assert want["n_dup_grams"].sum() > 20
        assert (want["n_dup_tokens"] == 0).any()
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (duplicate_gram_stats(ds, n=8, cross_doc_only=cross)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cross_doc_only_excludes_self_repeats():
    docs = {
        "a": "x y z p q r s t x y z p q r s t",   # self-repeated 8-gram
        "b": "unrelated words only here nothing repeats at all",
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    ds = ray.data.from_pandas(df)
    both = duplicate_gram_stats(ds, n=8).to_pandas().set_index("doc_id")
    cross = (duplicate_gram_stats(ds, n=8, cross_doc_only=True)
             .to_pandas().set_index("doc_id"))
    assert both.loc["a", "n_dup_grams"] > 0
    assert cross.loc["a", "n_dup_grams"] == 0
    assert cross.loc["b", "n_dup_grams"] == 0
