"""Training-data layout ops (stages/packing.py, stages/decontam.py) vs
driver-side pandas/numpy oracles, including parallelism invariance of
the block-prefix machinery."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_df(n=300, seed=3):
    rng = np.random.default_rng(seed)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta", "iota", "kappa"])
    texts = [" ".join(rng.choice(words, rng.integers(0, 30)))
             for _ in range(n)]
    texts[7] = ""                       # empty doc
    texts[11] = "   "                   # whitespace-only doc
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _ds(ray, df, nblocks):
    import ray.data
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(nblocks)


def _n_tokens(text):
    return len([t for t in text.lower().split() if t])


@pytest.mark.parametrize("nblocks", [1, 4, 13])
def test_pack_token_budget_matches_prefix_sum(ray_session, nblocks):
    from cartwright_ray.stages.packing import pack_token_budget

    df = _docs_df()
    got = pack_token_budget(_ds(ray_session, df, nblocks), budget=16) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    nt = df["text"].map(_n_tokens).to_numpy()
    start = np.cumsum(nt) - nt
    last = start + np.maximum(nt, 1) - 1
    assert (got["n_tokens"].to_numpy() == nt).all()
    assert (got["start_tok"].to_numpy() == start).all()
    assert (got["bin_start"].to_numpy() == start // 16).all()
    assert (got["bin_end"].to_numpy() == last // 16).all()


@pytest.mark.parametrize("nblocks", [1, 7])
def test_shuffled_order_matches_rank(ray_session, nblocks):
    from cartwright_ray.stages.packing import shuffled_order

    df = _docs_df(200, seed=9)
    got = shuffled_order(_ds(ray_session, df, nblocks)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    key = (df["doc_id"].to_numpy().astype(np.uint64)
           * np.uint64(2654435761)) % np.uint64(1 << 32)
    rank = np.argsort(np.argsort(key))        # keys are unique
    assert (got["shuffle_key"].to_numpy().astype(np.uint64) == key).all()
    assert (got["shuffle_rank"].to_numpy() == rank).all()
    # it IS a shuffle: rank order differs from id order
    assert not (got["shuffle_rank"].to_numpy()
                == np.arange(len(df))).all()


def test_contamination_flags_matches_brute_force(ray_session):
    from cartwright_ray.stages.decontam import (benchmark_gram_set,
                                                contamination_flags)

    df = _docs_df(250, seed=17)
    n = 5
    bench_rows = df[df.doc_id % 19 == 0]
    bench = benchmark_gram_set(pa.array(bench_rows["text"].tolist()), n=n)

    got = contamination_flags(_ds(ray_session, df, 6), bench, n=n) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def grams(text):
        toks = [t for t in text.lower().split() if t]
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    bset = set(g for t in bench_rows["text"] for g in grams(t))
    want_hits = df["text"].map(
        lambda t: sum(1 for g in grams(t) if g in bset)).to_numpy()
    want_n = df["text"].map(lambda t: len(grams(t))).to_numpy()
    assert (got["n_grams"].to_numpy() == want_n).all()
    assert (got["n_hits"].to_numpy() == want_hits).all()
    assert (got["contaminated"].to_numpy() == (want_hits > 0)).all()
    assert got["contaminated"].sum() >= len(bench_rows)  # self-hits


def test_decontam_empty_benchmark(ray_session):
    from cartwright_ray.stages.decontam import contamination_flags

    df = _docs_df(50)
    got = contamination_flags(_ds(ray_session, df, 2),
                              np.empty(0, dtype=str), n=5).to_pandas()
    assert (got["n_hits"] == 0).all() and (got["contaminated"] == 0).all()
