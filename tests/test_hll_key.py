"""hll_distinct_by_key — per-key HyperLogLog with the integer
(SQL-replayable) estimator.

The sequential replay below IS the spec: registers from the
double-Lehmer hash, integer raw estimator, integer-floored linear
counting. The distributed result must be bit-identical at any block
layout (registers merge by max — associative/commutative), and the
estimate must land within HLL's expected error of planted truth.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.sketch import (hll_distinct_by_key,
                                          lc_floor_table, lehmer2)


def _brute(vals, p=8):
    m = 1 << p
    q1 = 31 - p + 1
    h = lehmer2(np.asarray(vals, np.int64))
    regs = np.zeros(m, np.int64)
    w = h // m
    bl = np.zeros(len(w), np.int64)
    bl[w > 0] = np.frexp(w[w > 0].astype(np.float64))[1]
    np.maximum.at(regs, h % m, q1 - bl)
    sum_pow = int(np.sum(1 << (q1 - regs)))
    v = int(np.count_nonzero(regs == 0))
    raw = (7213 * m * m * m * (1 << q1)) // ((10000 * m + 10790) * sum_pow)
    if v > 0 and 2 * raw <= 5 * m:
        return lc_floor_table(m)[v - 1]
    return raw


def _run(df, p=8, blocks=7):
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = hll_distinct_by_key(ds, "k", "v", p=p).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_matches_brute_both_branches_and_layouts():
    rng = np.random.default_rng(7)
    # key "small" -> linear-counting branch; "big" -> raw branch
    small = rng.integers(0, 10**9, 120)
    big = rng.integers(0, 10**9, 5000)
    df = pd.DataFrame({
        "k": ["small"] * (len(small) * 2) + ["big"] * len(big),
        "v": np.concatenate([small, small, big])})  # dups don't move est
    want = {"small": _brute(small), "big": _brute(big)}
    for blocks in (1, 4, 19):
        out = _run(df.sample(frac=1, random_state=3), blocks=blocks)
        got = dict(zip(out["k"], out["est"]))
        assert got == want, (got, want)
    # branch sanity: small truly used LC (registers not all hit)
    m = 256
    assert want["small"] < 5 * m // 2 + 1


def test_estimate_accuracy_on_planted_cardinalities():
    rng = np.random.default_rng(11)
    frames = []
    truth = {}
    for k, n in [("a", 150), ("b", 2000), ("c", 40000)]:
        vals = rng.choice(10**12, size=n, replace=False)
        truth[k] = n
        frames.append(pd.DataFrame({"k": k, "v": vals}))
    out = _run(pd.concat(frames, ignore_index=True), blocks=9)
    for k, n in truth.items():
        est = int(out.loc[out["k"] == k, "est"].iloc[0])
        # 1.04/sqrt(256) ~ 6.5% standard error; allow 4 sigma
        assert abs(est - n) / n < 0.26, (k, est, n)


def test_duplicates_are_free_and_merge_is_max():
    vals = np.arange(1000)
    df1 = pd.DataFrame({"k": "x", "v": vals})
    df3 = pd.DataFrame({"k": "x", "v": np.tile(vals, 3)})
    assert _run(df1)["est"].iloc[0] == _run(df3)["est"].iloc[0] \
        == _brute(vals)


def test_cms_upper_bound_and_merge_invariance():
    """CMS point estimates: always ≥ the true count, exact when no
    collision, and identical at any block layout (sum-merge is
    associative)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from cartwright_ray.stages.sketch import cms_counts

    rng = np.random.default_rng(67)
    vals = rng.zipf(1.5, 5000).astype(np.int64) % 200
    df = pd.DataFrame({"v": vals})
    true = pd.Series(vals).value_counts()
    runs = []
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        runs.append(cms_counts(ds, "v", range(50)))
    pd.testing.assert_frame_equal(runs[0], runs[1])
    est = dict(zip(runs[0]["value"], runs[0]["est"]))
    over = 0
    for v in range(50):
        t = int(true.get(v, 0))
        assert est[v] >= t            # CMS never undercounts
        over += est[v] - t
    # 4 rows x 1024 width over 200 keys: collisions are rare
    assert over <= 4 * 5000 * 3 / 1024   # loose e/width-style bound
