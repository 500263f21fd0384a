"""Edit-distance similarity join (stages/editsim.py): the batched DP vs
a reference DP and DuckDB's levenshtein; the full join vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cartwright_ray.stages.editsim import (edit_similarity_join,
                                           levenshtein_pairs)


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = d
        d = [i] + [0] * lb
        for j in range(1, lb + 1):
            d[j] = min(d[j - 1] + 1, prev[j] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return d[lb]


def _rand_str(rng, lo=0, hi=12, alpha="abcde"):
    n = int(rng.integers(lo, hi))
    return "".join(rng.choice(list(alpha), n)) if n else ""


def test_batched_dp_matches_reference():
    rng = np.random.default_rng(5)
    A = [_rand_str(rng) for _ in range(400)]
    B = [_rand_str(rng) for _ in range(400)]
    got = levenshtein_pairs(A, B)
    want = [_ref_lev(a, b) for a, b in zip(A, B)]
    assert got.tolist() == want


def test_batched_dp_matches_duckdb():
    import duckdb
    rng = np.random.default_rng(7)
    A = [_rand_str(rng, 0, 20, "abcdefgh ") for _ in range(200)]
    B = [_rand_str(rng, 0, 20, "abcdefgh ") for _ in range(200)]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"a": A, "b": B}))
    want = [r[0] for r in
            con.execute("SELECT levenshtein(a, b) FROM t").fetchall()]
    assert levenshtein_pairs(A, B).tolist() == want


@pytest.mark.parametrize("max_dist", [1, 2, 3])
def test_join_matches_brute_force(ray_session, max_dist):
    import ray.data
    rng = np.random.default_rng(11)
    # clustered names so true matches exist, incl. short strings that
    # exercise the bound<=0 fallback
    stems = ["alpha", "beta", "gamma", "delta", "ez", "q"]
    b_names = sorted({s + suf for s in stems
                      for suf in ["", "x", "xy", "zzz"]})
    a_vals = []
    for _ in range(300):
        s = str(rng.choice(b_names))
        # random edits
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, max(len(s), 1)))
            op = rng.integers(0, 3)
            if op == 0 and s:
                s = s[:p] + "k" + s[p + 1:]
            elif op == 1:
                s = s[:p] + "m" + s[p:]
            elif s:
                s = s[:p] + s[p + 1:]
        a_vals.append(s)
    a = pd.DataFrame({"rid": np.arange(len(a_vals)), "name": a_vals})
    out = edit_similarity_join(
        ray.data.from_arrow(pa.Table.from_pandas(a, preserve_index=False))
        .repartition(4), b_names, max_dist=max_dist).to_pandas()
    got = sorted(zip(out["rid"], out["b_id"], out["edit_dist"]))
    want = sorted((r, b, _ref_lev(v, bn))
                  for r, v in zip(a["rid"], a["name"])
                  for b, bn in enumerate(b_names)
                  if _ref_lev(v, bn) <= max_dist)
    assert got == want
