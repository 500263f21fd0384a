"""line_dedup — repeated-span (boilerplate) removal.

Brute-force differential oracle plus the edge cases the vectorized
tiling has to honor: short last windows, within-doc repeats counting
once toward document frequency, all-boilerplate documents dropped,
zero-token documents emitting nothing, and multi-block inputs (the
count pass's per-batch distinct relies on one-doc-one-row, not on
block layout).
"""

import numpy as np
import pandas as pd
import pytest

import ray.data

from cartwright_ray.stages.dedup import line_dedup


def _brute(docs: dict[int, str], window: int, min_docs: int):
    """Reference implementation: dict of doc_id -> text."""
    wins = {}
    for did, text in docs.items():
        toks = text.split()
        wins[did] = [" ".join(toks[i:i + window])
                     for i in range(0, len(toks), window)]
    freq = {}
    for did, ws in wins.items():
        for w in set(ws):
            freq[w] = freq.get(w, 0) + 1
    boiler = {w for w, n in freq.items() if n >= min_docs}
    rows = []
    for did in sorted(docs):
        kept = [w for w in wins[did] if w not in boiler]
        if kept:
            rows.append({"doc_id": did, "text_clean": " ".join(kept),
                         "n_kept": len(kept),
                         "n_removed": len(wins[did]) - len(kept)})
    return pd.DataFrame(rows)


def _run(docs: dict[int, str], window=4, min_docs=2, blocks=5):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    ds = ds.repartition(blocks)
    out = line_dedup(ds, window=window, min_docs=min_docs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_matches_brute_force_random():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    boiler_a = "nav home about contact"          # 4 tokens = one window
    boiler_b = "footer legal terms privacy"
    docs = {}
    for did in range(60):
        words = list(rng.choice(vocab, size=int(rng.integers(1, 18))))
        if did % 3 == 0:
            words = boiler_a.split() + words
        if did % 4 == 0:
            words = words + boiler_b.split()
        docs[did] = " ".join(words)
    got = _run(docs, window=4, min_docs=3)
    want = _brute(docs, window=4, min_docs=3)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # the planted banners really were cut
    assert not got["text_clean"].str.contains("nav home").any()
    assert (got["n_removed"] > 0).sum() >= 20


def test_all_boilerplate_doc_dropped_and_short_windows():
    docs = {0: "spam spam spam spam",       # exactly the banner
            1: "spam spam spam spam unique tail",
            2: "spam spam spam spam other words here",
            3: "short",                     # 1-token window, unique
            4: ""}                          # zero tokens -> no output
    got = _run(docs, window=4, min_docs=3, blocks=3)
    want = _brute({k: v for k, v in docs.items()}, 4, 3)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert 0 not in set(got["doc_id"])      # all windows boilerplate
    assert 4 not in set(got["doc_id"])      # empty doc
    assert got.loc[got.doc_id == 3, "text_clean"].item() == "short"


def test_within_doc_repeat_counts_once():
    # the banner appears TWICE in doc 0 but only two distinct docs
    # carry it: min_docs=3 must keep it everywhere
    docs = {0: "a b c d a b c d", 1: "a b c d xx", 2: "zz yy"}
    got = _run(docs, window=4, min_docs=3, blocks=2)
    assert (got["n_removed"] == 0).all()
    # at min_docs=2 it is cut from both docs, twice from doc 0
    got2 = _run(docs, window=4, min_docs=2, blocks=2)
    want2 = _brute(docs, 4, 2)
    pd.testing.assert_frame_equal(got2, want2.reset_index(drop=True))
    assert 0 not in set(got2["doc_id"])     # both its windows cut


def test_heavy_limit_enforced():
    docs = {i: "same exact banner text" for i in range(10)}
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    with pytest.raises(ValueError, match="heavy_limit"):
        line_dedup(ds, window=4, min_docs=2, heavy_limit=0).to_pandas()
