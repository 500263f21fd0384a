"""upsert_merge — brute dict-replay: latest version wins, delete
tombstones, same-version delete beats update (the documented rule)."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.merge import upsert_merge


def _mk(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["k", "val", "version", "op"]))


def test_merge_semantics_and_layouts():
    snap = [(i, f"s{i}", 0, "U") for i in range(20)]
    delta = ([(i, f"d{i}", 1, "U") for i in range(0, 20, 2)]
             + [(i, "x", 2, "D") for i in range(0, 20, 5)]
             + [(100, "new", 1, "U")]
             # same-version conflict on key 7: D beats U
             + [(7, "u7", 3, "U"), (7, "x", 3, "D")])

    want = {}
    for k, val, v, op in snap + delta:
        cur = want.get(k)
        if cur is None or (v, op == "D") > (cur[1], cur[2] == "D"):
            want[k] = (val, v, op)
    want = pd.DataFrame(
        [(k, val, v, op) for k, (val, v, op) in sorted(want.items())
         if op != "D"],
        columns=["k", "val", "version", "op"])

    for blocks in (1, 4):
        got = upsert_merge(_mk(snap).repartition(blocks),
                           _mk(delta), "k") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # invariants: deleted keys gone, inserted key present, updated
    # rows carry the delta payload
    ks = set(want.k)
    assert 0 not in ks and 5 not in ks and 7 not in ks
    assert 100 in ks
    assert want[want.k == 2].iloc[0]["val"] == "d2"
    assert want[want.k == 1].iloc[0]["val"] == "s1"
