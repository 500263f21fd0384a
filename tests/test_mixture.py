"""Mixture composition: deterministic weighted sampling + source quotas."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_MULT = 2654435761
_MOD = 1 << 32


def _frame(n=400, n_src=8):
    return pd.DataFrame({"doc_id": np.arange(n),
                         "source": [f"src{i % n_src}" for i in range(n)]})


def _hash(ids):
    return (np.asarray(ids, dtype=np.uint64) * np.uint64(_MULT)) \
        % np.uint64(_MOD)


@pytest.mark.parametrize("parts", [1, 7])
def test_mixture_sample_matches_oracle_any_partitioning(ray_session, parts):
    import ray.data
    from cartwright_ray.stages.mixture import mixture_sample

    df = _frame()
    rates = {f"src{i}": (i % 4 + 1, 4) for i in range(8)}
    out = mixture_sample(ray.data.from_pandas(df).repartition(parts),
                         rates).to_pandas()
    h = _hash(df["doc_id"])
    idx = df["source"].str[3:].astype(int)
    want = df[h * 4 < (idx % 4 + 1).to_numpy().astype(np.uint64) * _MOD]
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])


def test_mixture_sample_rate_one_keeps_all_and_default(ray_session):
    import ray.data
    from cartwright_ray.stages.mixture import mixture_sample

    df = _frame(64, 2)
    out = mixture_sample(ray.data.from_pandas(df), {"src0": (1, 1)},
                         default_rate=(0, 1)).to_pandas()
    assert set(out["source"]) == {"src0"}          # default (0,1) drops src1
    assert len(out) == 32


def test_source_quota_matches_window_oracle(ray_session):
    import ray.data
    from cartwright_ray.stages.mixture import source_quota

    df = _frame(300, 5)
    out = source_quota(ray.data.from_pandas(df).repartition(6),
                       cap=7).to_pandas()
    h = _hash(df["doc_id"])
    oracle = df.assign(h=h.astype(np.int64)) \
               .sort_values(["source", "h", "doc_id"])
    oracle["src_rank"] = oracle.groupby("source").cumcount()
    want = oracle[oracle["src_rank"] < 7]
    got = out.sort_values(["source", "src_rank"])
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["src_rank"].tolist() == want["src_rank"].tolist()
    assert (out.groupby("source").size() == 7).all()


def test_temperature_mixture_rates_and_determinism():
    """alpha=0.5 keeps the smallest source whole (rate exactly 1) and
    downsamples a 16x source to ~1/4; acceptance is layout-invariant
    and a pure function of doc_id."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.mixture import temperature_mixture

    rows = []
    did = 0
    for src, n in [("small", 500), ("big", 8000)]:
        for _ in range(n):
            rows.append((did, src))
            did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])

    outs = []
    for blocks in (1, 6):
        got = temperature_mixture(
            ray.data.from_pandas(df).repartition(blocks)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]

    kept = got.groupby("source").size()
    assert kept["small"] == 500                 # rate exactly 1
    # rate for big = floor(2^20 * sqrt(500/8000)) / 2^20 = 1/4
    frac = kept["big"] / 8000
    assert 0.2 < frac < 0.3
    # deterministic: the kept id set is a function of doc_id alone
    from cartwright_ray.stages.mixture import _id_hash
    h = _id_hash(df["doc_id"].to_numpy())
    num = int(np.floor((1 << 20) * np.sqrt(500.0 / 8000.0)))
    want_big = df[(df.source == "big")
                  & (h * np.uint64(1 << 20)
                     < np.uint64(num) * np.uint64(1 << 32))]
    assert set(got[got.source == "big"].doc_id) \
        == set(want_big.doc_id)
