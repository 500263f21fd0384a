"""BFS hop distances and k-core peeling — plan equivalence against
one-loop numpy/Python brute-force specs, over random graphs at several
block layouts, including unreachable nodes, empty frontiers (iters
beyond the diameter) and full-graph peels."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from cartwright_ray.stages.bfs import bfs_hops
from cartwright_ray.stages.kcore import kcore


def _digraph(seed=11, n=120, m=500):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"src": rng.integers(0, n, m).astype(np.int64),
                         "dst": rng.integers(0, n, m).astype(np.int64)})


def bfs_brute(edges: pd.DataFrame, seeds, iters: int) -> pd.DataFrame:
    dist = {int(s): 0 for s in seeds}
    adj = {}
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), set()).add(int(d))
    frontier = set(dist)
    for t in range(iters):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = t + 1
                    nxt.add(v)
        frontier = nxt
    ks = sorted(dist)
    return pd.DataFrame({"node": np.array(ks, np.int64),
                         "dist": np.array([dist[k] for k in ks],
                                          np.int64)})


def kcore_brute(edges: pd.DataFrame, k: int, rounds: int) -> pd.DataFrame:
    e = {(int(a), int(b)) for a, b in zip(edges["a"], edges["b"])}
    for _ in range(rounds):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        e = {(a, b) for a, b in e if deg[a] >= k and deg[b] >= k}
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ks = sorted(deg)
    return pd.DataFrame({"node": np.array(ks, np.int64),
                         "deg": np.array([deg[k] for k in ks], np.int64)})


@pytest.mark.parametrize("iters", [0, 2, 40])
@pytest.mark.parametrize("blocks", [1, 7])
def test_bfs_plans_match_brute(ray_session, iters, blocks):
    edges = _digraph()
    seeds = np.array([0, 3, 119], np.int64)
    want = bfs_brute(edges, seeds, iters)
    e_ds = ray.data.from_pandas(edges).repartition(blocks)
    s_ds = ray.data.from_pandas(pd.DataFrame({"node": seeds}))
    for plan in ("broadcast", "shuffle"):
        got = bfs_hops(e_ds, s_ds, iters=iters, plan=plan).to_pandas()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bfs_isolated_seed(ray_session):
    # a seed with no out-edges still appears at dist 0
    edges = pd.DataFrame({"src": [1], "dst": [2]})
    seeds = pd.DataFrame({"node": [99]})
    got = bfs_hops(ray.data.from_pandas(edges),
                   ray.data.from_pandas(seeds), iters=3,
                   plan="broadcast").to_pandas()
    assert got["node"].tolist() == [99] and got["dist"].tolist() == [0]


@pytest.mark.parametrize("k,rounds", [(3, 1), (4, 3), (50, 2)])
@pytest.mark.parametrize("blocks", [1, 5])
def test_kcore_plans_match_brute(ray_session, k, rounds, blocks):
    rng = np.random.default_rng(7)
    n, m = 90, 420
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    edges = pd.DataFrame({"a": np.minimum(a, b)[keep].astype(np.int64),
                          "b": np.maximum(a, b)[keep].astype(np.int64)})
    want = kcore_brute(edges.drop_duplicates(), k, rounds)
    e_ds = ray.data.from_pandas(edges).repartition(blocks)
    for plan in ("broadcast", "shuffle"):
        got = kcore(e_ds, k=k, rounds=rounds, plan=plan).to_pandas()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False)


def test_kcore_converged_extra_rounds_noop(ray_session):
    # once converged, extra rounds change nothing (monotone peeling)
    rng = np.random.default_rng(3)
    n, m = 60, 300
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    edges = pd.DataFrame({"a": np.minimum(a, b)[keep].astype(np.int64),
                          "b": np.maximum(a, b)[keep].astype(np.int64)})
    e_ds = ray.data.from_pandas(edges)
    r4 = kcore(e_ds, k=5, rounds=4, plan="broadcast").to_pandas()
    r9 = kcore(e_ds, k=5, rounds=9, plan="broadcast").to_pandas()
    if len(r4) and kcore_brute(edges.drop_duplicates(), 5, 4).equals(
            kcore_brute(edges.drop_duplicates(), 5, 9)):
        pd.testing.assert_frame_equal(r4, r9, check_dtype=False)


def test_link_prediction_ra_matches_brute():
    """RA link prediction: brute adjacency-set replay on a random
    graph; existing edges excluded; fixed-point weights exact."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.triangles import RA_FP_ONE, \
        link_prediction_ra

    rng = np.random.default_rng(17)
    n = 60
    a = rng.integers(0, n, 300)
    b = rng.integers(0, n, 300)
    keep = a != b
    a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    df = pd.DataFrame({"a": a, "b": b})

    adj = {}
    eset = set()
    for x, y in zip(a.tolist(), b.tolist()):
        if (x, y) in eset:
            continue
        eset.add((x, y))
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    cand = {}
    for w, nbrs in adj.items():
        wt = RA_FP_ONE // len(nbrs)
        nbrs = sorted(nbrs)
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                key = (nbrs[i], nbrs[j])
                cn, ra = cand.get(key, (0, 0))
                cand[key] = (cn + 1, ra + wt)
    want = sorted(((ra, cn, x, y) for (x, y), (cn, ra) in cand.items()
                   if (x, y) not in eset),
                  key=lambda r: (-r[0], -r[1], r[2], r[3]))[:50]
    want = pd.DataFrame(
        [(x, y, cn, ra, ra / RA_FP_ONE) for ra, cn, x, y in want],
        columns=["a", "b", "cn", "ra_int", "ra"])

    for blocks in (1, 5):
        got = link_prediction_ra(
            ray.data.from_pandas(df).repartition(blocks), k=50)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)


def test_sssp_bounded_matches_brute_both_plans():
    """Weighted bounded Bellman-Ford: brute full-relaxation replay on a
    random weighted digraph; both plans identical at any layout; the
    changed-set frontier must lose nothing when a node's dist improves
    in a late round."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.bfs import sssp_bounded

    rng = np.random.default_rng(41)
    n, m, iters = 80, 400, 4
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, 10, m)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    seeds = np.array([0, 7, 33])

    BIG = 1 << 60
    d = {int(s): 0 for s in seeds}
    for _ in range(iters):
        nd = dict(d)
        for s, t, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
            if s in d and d[s] + ww < nd.get(t, BIG):
                nd[t] = d[s] + ww
        d = nd
    want = pd.DataFrame(sorted(d.items()), columns=["node", "dist"])

    edges_df = pd.DataFrame({"src": src, "dst": dst, "w": w})
    seeds_df = pd.DataFrame({"node": seeds})
    for plan in ("broadcast", "shuffle"):
        for blocks in (1, 5):
            got = sssp_bounded(
                ray.data.from_pandas(edges_df).repartition(blocks),
                ray.data.from_pandas(seeds_df), iters=iters,
                plan=plan).to_pandas()
            pd.testing.assert_frame_equal(got, want,
                                          check_dtype=False)


def test_sssp_late_improvement_via_changed_frontier():
    """A path graph where the cheap route arrives later than the
    expensive direct edge: round 1 sets dist(3)=10 via the direct
    edge; the 1-weight chain improves it in round 3 — only a correct
    changed-set frontier propagates the improvement."""
    import pandas as pd
    import ray.data

    from cartwright_ray.stages.bfs import sssp_bounded

    edges = pd.DataFrame({
        "src": [0, 0, 1, 2],
        "dst": [3, 1, 2, 3],
        "w": [10, 1, 1, 1]})
    seeds = pd.DataFrame({"node": [0]})
    for plan in ("broadcast", "shuffle"):
        got = sssp_bounded(ray.data.from_pandas(edges),
                           ray.data.from_pandas(seeds), iters=3,
                           plan=plan).to_pandas()
        assert got.set_index("node").loc[3, "dist"] == 3
