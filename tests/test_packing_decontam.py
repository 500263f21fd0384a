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


def test_repetition_signals_planted(ray_session):
    from cartwright_ray.stages.repetition import repetition_signals

    df = _docs_df(120, seed=21)
    df.loc[3, "text"] = "spam line\nspam line\nother\nspam line"
    df.loc[5, "text"] = "buy now buy now buy now great deal"
    df.loc[9, "text"] = "\n\n"           # empty lines only
    got = repetition_signals(_ds(ray_session, df, 5)).to_pandas() \
        .set_index("doc_id")
    r3 = got.loc[3]
    assert r3["dup_line_chars"] == 3 * len("spam line")
    assert r3["line_chars"] == 3 * len("spam line") + len("other")
    r5 = got.loc[5]
    assert r5["top2_gram"] == "buy now" and r5["top2_count"] == 3
    assert r5["top2_chars"] == 3 * len("buy now")
    r9 = got.loc[9]
    assert r9["line_chars"] == 0 and r9["dup_line_chars"] == 0
    # brute-force check of dup-line chars across all docs
    for did, text in zip(df["doc_id"], df["text"]):
        lines = text.split("\n")
        from collections import Counter
        cnt = Counter(lines)
        want = sum(len(l) * c for l, c in cnt.items() if c > 1)
        assert got.loc[did]["dup_line_chars"] == want, did


def test_media_captions_nearest_preceding_text(ray_session):
    """Caption = nearest PRECEDING text span, same document only: a
    media-first doc gets a null caption even when the previous doc
    ends with text (the cross-doc guard)."""
    import ray.data

    from cartwright_ray.stages.spans import media_captions

    def sp(kind, text="", ref="", off=0):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    spans = pa.array([
        [sp("text", "intro 12.3456, 65.4321 here"),
         sp("media", ref="m://a/1"),
         sp("text", "middle"), sp("media", ref="m://a/2")],
        [sp("media", ref="m://b/1"), sp("text", "after")],   # media first
        [sp("text", "only text")],                            # no media
    ])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b", "c"]), "spans": spans}))
    got = media_captions(ds).to_pandas() \
        .sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert list(got["doc_id"]) == ["a", "a", "b"]
    assert list(got["span_idx"]) == [1, 3, 0]
    assert got["caption"][0] == "intro [COORD] here"       # redacted
    assert got["caption"][1] == "middle"                   # nearest, not first
    assert got["caption"][2] is None or pd.isna(got["caption"][2])
    assert list(got["media_ref"]) == ["m://a/1", "m://a/2", "m://b/1"]


def test_pack_and_shuffle_survive_empty_sort_blocks(ray_session):
    """ADVICE r04: rows < partitions makes Ray's sort emit EMPTY blocks;
    pc.min on them is null and the old prefix partial crashed
    sort_values with a None/int comparison. 3 rows over 8 blocks must
    still pack and rank correctly."""
    from cartwright_ray.stages.packing import (pack_token_budget,
                                               shuffled_order)

    df = pd.DataFrame({"doc_id": np.array([5, 1, 9], dtype=np.int64),
                       "text": ["alpha beta", "gamma", "delta eps zeta"]})
    ds = _ds(ray_session, df, 8)
    got = pack_token_budget(ds, budget=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # id order 1, 5, 9 -> token counts 1, 2, 3 -> starts 0, 1, 3
    assert list(got["doc_id"]) == [1, 5, 9]
    assert list(got["n_tokens"]) == [1, 2, 3]
    assert list(got["start_tok"]) == [0, 1, 3]
    rank = shuffled_order(ds).to_pandas().sort_values("doc_id")
    assert sorted(rank["shuffle_rank"]) == [0, 1, 2]
    key = (rank["doc_id"].to_numpy().astype(np.uint64)
           * np.uint64(2654435761)) % np.uint64(1 << 32)
    assert list(rank["shuffle_rank"]) == list(np.argsort(np.argsort(key)))


def test_block_prefix_handles_explicit_empty_block(ray_session):
    """Direct unit case: a zero-row block inside the materialized input
    contributes 0 and no null __min row."""
    import ray.data

    from cartwright_ray.stages.packing import _block_exclusive_prefix

    t1 = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "w": pa.array([10, 10], pa.int64())})
    empty = t1.slice(0, 0)
    t2 = pa.table({"k": pa.array([3], pa.int64()),
                   "w": pa.array([7], pa.int64())})
    mat = ray.data.from_arrow([t1, empty, t2]).materialize()
    prefix = _block_exclusive_prefix(mat, "k", "w")
    assert prefix == {(1, 2): 0, (3, 3): 20}


def test_decontam_empty_benchmark(ray_session):
    from cartwright_ray.stages.decontam import contamination_flags

    df = _docs_df(50)
    got = contamination_flags(_ds(ray_session, df, 2),
                              np.empty(0, dtype=str), n=5).to_pandas()
    assert (got["n_hits"] == 0).all() and (got["contaminated"] == 0).all()
