"""lm_score — corpus-trained bigram LM quality scoring.

Brute-force differential oracle (pure-Python count + score) on random
word soups across multiple blocks, plus the edge cases: one-word and
empty documents (no transitions → 0.0), repeated-bigram documents
scoring HIGHER than shuffled-vocabulary noise, and the model-limit
guard.
"""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from cartwright_ray.stages.lm import lm_score


def _brute(docs: dict[int, str]):
    toks = {d: t.split() for d, t in docs.items()}
    vocab = sorted({w for ws in toks.values() for w in ws})
    V = len(vocab)
    hist, bc = {}, {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            hist[a] = hist.get(a, 0) + 1
            bc[(a, b)] = bc.get((a, b), 0) + 1
    rows = []
    for d in sorted(docs):
        ws = toks[d]
        lps = [math.log(bc[(a, b)] + 1.0) - math.log(hist[a] + V)
               for a, b in zip(ws, ws[1:])]
        avg = (sum(lps) / len(lps)) if lps else 0.0
        rows.append({"doc_id": d, "n_bigrams": len(lps),
                     "avg_logprob": math.floor(avg * 1e6) / 1e6})
    return pd.DataFrame(rows)


def _run(docs: dict[int, str], blocks=5):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    out = lm_score(ds.repartition(blocks)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_matches_brute_force_random():
    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(15)]
    docs = {d: " ".join(rng.choice(vocab,
                                   size=int(rng.integers(0, 25))))
            for d in range(80)}
    docs[78] = "solo"                       # one word: no transitions
    docs[79] = ""                           # empty doc
    got = _run(docs)
    want = _brute(docs)
    pd.testing.assert_frame_equal(got, want)
    assert got.loc[got.doc_id == 78, "n_bigrams"].item() == 0
    assert got.loc[got.doc_id == 78, "avg_logprob"].item() == 0.0


def test_fluent_docs_outscore_noise():
    # a strongly repeated phrase dominates the model: documents made of
    # it must score higher than uniform-random token soup
    rng = np.random.default_rng(9)
    phrase = "the quick brown fox"
    docs = {d: " ".join([phrase] * 5) for d in range(10)}
    noise_vocab = phrase.split() + [f"x{i}" for i in range(20)]
    for d in range(10, 20):
        docs[d] = " ".join(rng.choice(noise_vocab, size=20))
    got = _run(docs, blocks=3).set_index("doc_id")
    fluent = got.loc[range(10), "avg_logprob"].mean()
    noisy = got.loc[range(10, 20), "avg_logprob"].mean()
    assert fluent > noisy + 0.5
    pd.testing.assert_frame_equal(
        got.reset_index(), _brute(docs))


def test_model_limit_enforced():
    docs = {d: f"a{d} b{d} c{d}" for d in range(20)}
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    with pytest.raises(ValueError, match="model_limit"):
        lm_score(ds, model_limit=3).to_pandas()
