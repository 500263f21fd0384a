"""llm_corpus_prep composite: the two rank-attach plans (broadcast
collect under the row bound vs keyed equi_join_shuffle above it) must be
value-identical — the shuffle plan is the 100-TB path (VERDICT r04)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs_df(n=400, seed=11):
    rng = np.random.default_rng(seed)
    # Gopher-ish sentences with mixed word lengths so the quality gate
    # keeps a healthy fraction (all-short-word text fails the
    # mean-word-length rule)
    words = np.array(["the", "quick", "brown", "foxes", "jumped", "over",
                      "a", "lazy", "sleeping", "dog", "yesterday", "and",
                      "nothing", "interesting", "happened", "afterwards"])
    texts = [" ".join(rng.choice(words, 55)) for _ in range(n)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "source": [f"src{i % 5}" for i in range(n)]})


def test_rank_attach_plans_agree(ray_session):
    import ray.data

    from cartwright_ray.pipelines.llm_prep import llm_corpus_prep
    from cartwright_ray.stages.decontam import benchmark_gram_set

    df = _docs_df()
    bench = benchmark_gram_set(
        pa.array([df["text"][3], df["text"][17]]), n=8)
    rates = {f"src{i}": ((i % 4) + 1, 4) for i in range(5)}

    def run(limit):
        ds = ray.data.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
        out = llm_corpus_prep(ds, bench, rates,
                              rank_broadcast_limit=limit).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True) \
            .sort_index(axis=1)

    broadcast = run(10_000_000)        # all rows under the bound
    shuffle = run(0)                   # force the keyed shuffle attach
    assert len(broadcast) > 0          # the chain actually kept docs
    pd.testing.assert_frame_equal(broadcast, shuffle)
    # ranks are a permutation of 0..n-1 and every packed column is intact
    n = len(broadcast)
    assert sorted(broadcast["shuffle_rank"]) == list(range(n))
    assert {"n_tokens", "start_tok", "bin_start", "bin_end",
            "shuffle_key", "shuffle_rank"} <= set(broadcast.columns)
