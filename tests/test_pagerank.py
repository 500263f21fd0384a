"""Integer fixed-point PageRank — plan equivalence and spec replay.

`pagerank_brute` (one numpy loop, two floor divisions) is the spec;
the broadcast and shuffle plans must both reproduce it bit-exactly at
any block layout, including dangling nodes (no out-links) and sink-free
nodes (no in-links, which must land exactly on the damped base).
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.pagerank import pagerank, pagerank_brute


def _graph(seed=3, n=150, m=700):
    rng = np.random.default_rng(seed)
    edges = pd.DataFrame({"src": rng.integers(0, n, m),
                          "dst": rng.integers(0, n, m)})
    # nodes n..n+4 have no edges at all (dangling AND no in-links)
    nodes = pd.DataFrame({"node": np.arange(n + 5, dtype=np.int64)})
    return edges, nodes


def test_plans_match_brute_and_each_other():
    edges, nodes = _graph()
    want = pagerank_brute(edges, nodes["node"].to_numpy())
    for blocks in (1, 7):
        e_ds = ray.data.from_pandas(edges).repartition(blocks)
        n_ds = ray.data.from_pandas(nodes).repartition(3)
        got_b = pagerank(e_ds, n_ds, plan="broadcast").to_pandas()
        assert (got_b["node"].to_numpy()
                == nodes["node"].to_numpy()).all()
        np.testing.assert_array_equal(got_b["rank"].to_numpy(), want)
    got_s = pagerank(
        ray.data.from_pandas(edges).repartition(5),
        ray.data.from_pandas(nodes), plan="shuffle").to_pandas()
    got_s = got_s.sort_values("node").reset_index(drop=True)
    np.testing.assert_array_equal(got_s["rank"].to_numpy(), want)


def test_isolated_nodes_get_exact_base():
    edges, nodes = _graph()
    out = pagerank(ray.data.from_pandas(edges),
                   ray.data.from_pandas(nodes),
                   plan="broadcast").to_pandas()
    base = (15 * 10**12) // 100
    iso = out[out["node"] >= 150]["rank"].to_numpy()
    assert (iso == base).all()


def test_rank_mass_is_conserved_up_to_floor_loss():
    # every floor division only ever LOSES mass: total <= n * scale,
    # and must stay above the all-base floor
    edges, nodes = _graph(seed=11)
    out = pagerank(ray.data.from_pandas(edges),
                   ray.data.from_pandas(nodes),
                   plan="broadcast").to_pandas()
    n, scale = len(nodes), 10**12
    total = int(out["rank"].sum())
    assert total <= n * scale
    assert total >= n * ((15 * scale) // 100)
