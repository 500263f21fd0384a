"""grid_dbscan — cell-bucketed density clustering.

Brute-force differential reference (dict-based flood fill) on random
clouds plus the structural edge cases: chain connectivity across many
cells, border points adopting the adjacent component, all-noise inputs,
points on cell boundaries, and the no-wrap rule at the antimeridian.
"""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.dbscan import grid_dbscan

SHIFT = 2 ** 32


def _brute(lat, lon, cell_deg, min_pts):
    def cell(la, lo):
        return (int(np.floor((lo + 180.0) / cell_deg)),
                int(np.floor((la + 90.0) / cell_deg)))

    cells = [cell(la, lo) for la, lo in zip(lat, lon)]
    counts = {}
    for c in cells:
        counts[c] = counts.get(c, 0) + 1
    core = {c for c, n in counts.items() if n >= min_pts}
    # flood fill over 8-neighborhood
    comp = {}
    for c in sorted(core, key=lambda c: c[0] * SHIFT + c[1]):
        if c in comp:
            continue
        label = c[0] * SHIFT + c[1]
        stack = [c]
        comp[c] = label
        while stack:
            x, y = stack.pop()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (x + dx, y + dy)
                    if nb in core and nb not in comp:
                        comp[nb] = label
                        stack.append(nb)

    out = []
    for c in cells:
        cand = [comp[(c[0] + dx, c[1] + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (c[0] + dx, c[1] + dy) in comp]
        out.append(min(cand) if cand else -1)
    return np.array(out, np.int64)


def _run(lat, lon, cell_deg=5.0, min_pts=2, blocks=5):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"pid": np.arange(len(lat)), "lat": lat, "lon": lon}))
    out = (grid_dbscan(ds.repartition(blocks), cell_deg=cell_deg,
                       min_pts=min_pts)
           .to_pandas().sort_values("pid").reset_index(drop=True))
    return out["cluster"].to_numpy()


def test_matches_brute_force_random():
    rng = np.random.default_rng(11)
    # three dense blobs + uniform background noise
    blobs = [(-20.0, 30.0), (42.0, -100.0), (-33.0, 151.0)]
    lat, lon = [], []
    for blat, blon in blobs:
        lat += list(blat + rng.normal(0, 2.0, 40))
        lon += list(blon + rng.normal(0, 2.0, 40))
    lat += list(rng.uniform(-85, 85, 60))
    lon += list(rng.uniform(-179, 179, 60))
    lat, lon = np.array(lat), np.array(lon)
    got = _run(lat, lon, cell_deg=5.0, min_pts=3)
    want = _brute(lat, lon, 5.0, 3)
    np.testing.assert_array_equal(got, want)
    labels = set(got) - {-1}
    assert len(labels) >= 3                     # the three blobs separate
    assert (got == -1).sum() > 0                # background noise exists


def test_chain_connectivity_single_cluster():
    # a diagonal chain of dense cells: every cell is core and adjacent
    # to the next -> ONE component labeled by the min cell id
    lat = np.repeat(np.arange(-30, 30, 5.0) + 2.5, 2)
    lon = np.repeat(np.arange(0, 60, 5.0) + 2.5, 2)
    got = _run(lat, lon, cell_deg=5.0, min_pts=2, blocks=4)
    assert len(set(got)) == 1 and got[0] != -1
    np.testing.assert_array_equal(got, _brute(lat, lon, 5.0, 2))


def test_border_points_and_noise():
    # dense cell around (2.5, 2.5); single point one cell over is a
    # border point; a far point is noise
    lat = np.array([2.5, 2.6, 2.4, 7.5, 60.0])
    lon = np.array([2.5, 2.6, 2.4, 2.5, -120.0])
    got = _run(lat, lon, cell_deg=5.0, min_pts=3, blocks=2)
    want = _brute(lat, lon, 5.0, 3)
    np.testing.assert_array_equal(got, want)
    assert got[3] == got[0]                     # border joins the cluster
    assert got[4] == -1                         # noise


def test_antimeridian_does_not_wrap():
    # dense cells hugging both sides of the antimeridian stay separate
    lat = np.array([0.5, 0.6, 0.5, 0.6])
    lon = np.array([-179.5, -179.6, 179.5, 179.6])
    got = _run(lat, lon, cell_deg=1.0, min_pts=2, blocks=2)
    assert got[0] == got[1] and got[2] == got[3]
    assert got[0] != got[2]
    np.testing.assert_array_equal(got, _brute(lat, lon, 1.0, 2))


def test_all_noise():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 30)
    lon = rng.uniform(-170, 170, 30)
    got = _run(lat, lon, cell_deg=1.0, min_pts=5)
    np.testing.assert_array_equal(got, _brute(lat, lon, 1.0, 5))
    assert (got == -1).all()
