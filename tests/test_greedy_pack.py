"""pack_greedy_bins — greedy first-fit sequence packing distributed as
a finite-state function-composition scan.

The sequential brute force is the spec; the distributed result must be
bit-identical at ANY block layout (the whole point of the transfer-
table composition), including zero-token documents, oversized
documents, exactly-full bins, and blocks that begin mid-bin.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.packing import pack_greedy_bins


def _brute(sizes, budget):
    """The sequential recurrence, straight from the docstring."""
    ids, nxt, open_, tot, cur = [], 0, False, 0, -1
    for s in sizes:
        if open_ and tot + s <= budget:
            ids.append(cur)
            tot += s
        else:
            cur = nxt
            nxt += 1
            ids.append(cur)
            if s > budget:
                open_ = False            # oversized bin closes at once
            else:
                open_, tot = True, s
    return np.array(ids, np.int64)


def _run(sizes, budget, blocks):
    texts = [" ".join(["w"] * s) for s in sizes]      # s tokens each
    df = pd.DataFrame({"doc_id": np.arange(len(sizes)), "text": texts})
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = pack_greedy_bins(ds, budget=budget).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_tokens"]) == list(sizes)
    return out["bin_id"].to_numpy()


def test_matches_brute_random_and_layout_invariant():
    rng = np.random.default_rng(31)
    sizes = rng.integers(0, 40, 400).tolist()
    sizes[7] = 0
    sizes[50] = 150                      # oversized (budget 100)
    sizes[51] = 0                        # zero doc right after oversized
    sizes[200] = 100                     # exactly budget-sized
    want = _brute(sizes, 100)
    for blocks in (1, 3, 17):
        got = _run(sizes, 100, blocks)
        np.testing.assert_array_equal(got, want)
    assert want.max() > 50               # it actually made many bins


def test_exact_fill_and_zero_doc_boundaries():
    # 50+50 fills bin 0 exactly; the zero doc still joins it; the next
    # doc opens bin 1
    sizes = [50, 50, 0, 10]
    got = _run(sizes, 100, blocks=2)
    np.testing.assert_array_equal(got, [0, 0, 0, 1])
    np.testing.assert_array_equal(got, _brute(sizes, 100))


def test_oversized_runs_alone_and_closes():
    sizes = [30, 200, 0, 5, 300, 300]
    want = _brute(sizes, 100)
    got = _run(sizes, 100, blocks=3)
    np.testing.assert_array_equal(got, want)
    # doc 1 alone; the zero doc did NOT join the oversized bin
    assert got[1] != got[0] and got[2] != got[1]


def test_block_boundary_mid_bin():
    # bins straddle every block boundary: 7 docs of 30 at budget 100
    # -> bins of 3,3,1 docs regardless of layout
    sizes = [30] * 7
    want = _brute(sizes, 100)
    for blocks in (2, 4, 7):
        np.testing.assert_array_equal(_run(sizes, 100, blocks), want)
    np.testing.assert_array_equal(want, [0, 0, 0, 1, 1, 1, 2])
