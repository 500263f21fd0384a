"""triangle_count — brute-force differential + known closed forms.

The brute oracle enumerates vertex triples over the dedup'd edge set;
the wedge-closure pipeline must match at any block layout, on graphs
with duplicate input edges, isolated vertices and a planted clique
(K₅ has exactly C(5,3)=10 triangles, C(5,2)·... wedges counted at the
lowest vertex only).
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.triangles import triangle_count


def _brute(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({v for e in es for v in e})
    tri = 0
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) not in es:
                continue
            for z in nodes:
                if z > y and (x, z) in es and (y, z) in es:
                    tri += 1
    wedges = 0
    adj = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
    for a, nb in adj.items():
        k = len(nb)
        wedges += k * (k - 1) // 2
    return len(es), wedges, tri


def _run(pairs, blocks):
    df = pd.DataFrame(pairs, columns=["u", "v"])
    df = pd.DataFrame({"a": np.minimum(df["u"], df["v"]),
                       "b": np.maximum(df["u"], df["v"])}).astype(np.int64)
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = triangle_count(ds)
    return tuple(int(out.loc[0, c])
                 for c in ("n_edges", "n_wedges", "n_triangles"))


def test_random_graph_matches_brute():
    rng = np.random.default_rng(89)
    pairs = [(int(a), int(b)) for a, b in
             rng.integers(0, 40, (600, 2)) if a != b]
    want = _brute(pairs)
    assert want[2] > 20
    for blocks in (1, 5, 13):
        assert _run(pairs, blocks) == want


def test_planted_clique_and_duplicates():
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs = k5 + k5 + [(10, 11), (11, 12), (20, 21)]  # dupes + path
    e, w, t = _run(pairs, 3)
    assert t == 10                     # C(5,3)
    assert e == 10 + 3
    # wedges at lowest vertex: node0 has 4 higher nbrs -> 6, node1: 3
    # -> 3, node2: 2 -> 1, node3: 1 -> 0; plus node10(1)=0, node11
    # (one higher nbr 12, 10 is lower) -> 0, node20 -> 0
    assert w == 6 + 3 + 1


def test_triangle_free_graph():
    ring = [(i, (i + 1) % 8) for i in range(8)]    # even cycle: no tri
    e, w, t = _run(ring, 2)
    assert (e, t) == (8, 0)


def test_clustering_coefficient_matches_brute():
    from cartwright_ray.stages.triangles import clustering_coefficient
    rng = np.random.default_rng(97)
    pairs = [(int(a), int(b)) for a, b in
             rng.integers(0, 25, (250, 2)) if a != b]
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for v in sorted(adj):
        nb = sorted(adj[v])
        t = sum(1 for i, p in enumerate(nb) for q in nb[i + 1:]
                if (min(p, q), max(p, q)) in es)
        d = len(nb)
        c = 0.0 if d < 2 else 2.0 * float(t) / (float(d) * (float(d) - 1.0))
        rows.append((v, d, t, c))
    want = pd.DataFrame(rows, columns=["node", "deg", "tri", "coeff"])
    df = pd.DataFrame(list(es), columns=["a", "b"]).astype(np.int64)
    for blocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = clustering_coefficient(ds)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # K5 corner case: every node fully clustered
    k5 = pd.DataFrame([(i, j) for i in range(5) for j in range(i + 1, 5)],
                      columns=["a", "b"]).astype(np.int64)
    out = clustering_coefficient(ray.data.from_pandas(k5))
    assert (out["coeff"] == 1.0).all() and (out["tri"] == 6).all()
