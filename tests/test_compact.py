"""Geohash cell-set compaction (geo/compact.py): distributed result ==
plain-Python reference, cascade behavior, and covering equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from cartwright_ray.geo.compact import compact_geohash, compact_reference

_A = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ds(ray, cells, nblocks=4):
    import ray.data
    return ray.data.from_arrow(
        pa.table({"cell": pa.array(list(cells), pa.string())})
    ).repartition(nblocks)


def _run(ray, cells, **kw) -> set:
    out = compact_geohash(_ds(ray, cells), **kw).to_pandas()
    return set(out["cell"]) if len(out) else set()


# small_limit=0 forces the distributed level-loop plan; the default takes
# the single-task fast path — every behavior test runs under BOTH
_PLANS = [{"small_limit": 0}, {}]


@pytest.mark.parametrize("plan", _PLANS)
def test_complete_family_collapses(ray_session, plan):
    cells = [f"9q{c}" for c in _A]                       # all 32 children
    assert _run(ray_session, cells, **plan) == {"9q"}


@pytest.mark.parametrize("plan", _PLANS)
def test_incomplete_family_stays(ray_session, plan):
    cells = [f"9q{c}" for c in _A[:31]]                  # 31 of 32
    assert _run(ray_session, cells, **plan) == set(cells)


@pytest.mark.parametrize("plan", _PLANS)
def test_cascade_two_levels(ray_session, plan):
    # every p3 child family under parent "7" complete -> 32 p3 cells ->
    # they are themselves a complete p2 family -> "7"
    cells = [f"7{b}{c}" for b in _A for c in _A]
    assert _run(ray_session, cells, **plan) == {"7"}


@pytest.mark.parametrize("plan", _PLANS)
def test_min_len_stops_cascade(ray_session, plan):
    cells = [f"7{b}{c}" for b in _A for c in _A]
    assert _run(ray_session, cells, min_len=2, **plan) == {f"7{b}" for b in _A}


@pytest.mark.parametrize("plan", _PLANS)
def test_mixed_precision_and_duplicates(ray_session, plan):
    cells = [f"9q{c}" for c in _A] + ["9q", "dr5", "dr5"]
    assert _run(ray_session, cells, **plan) == {"9q", "dr5"}


@pytest.mark.parametrize("plan", _PLANS)
def test_matches_reference_on_random_sets(ray_session, plan):
    rng = np.random.default_rng(23)
    a = np.array(list(_A))
    for trial in range(3):
        n = 3000
        depth = rng.integers(2, 5, size=n)
        cells = ["".join(a[rng.integers(0, 4, size=d)])   # tiny alphabet
                 for d in depth]                          # -> dense families
        # splice in guaranteed-complete families
        for p in ["01", "23"]:
            cells.extend(p + c for c in _A)
        want = compact_reference(cells, min_len=1)
        got = _run(ray_session, cells, min_len=1, **plan)
        assert got == want, f"trial {trial}"


@pytest.mark.parametrize("plan", _PLANS)
def test_covering_preserved(ray_session, plan):
    """Every input cell is a prefix-descendant of some output cell (the
    compacted set still covers everything the input covered)."""
    rng = np.random.default_rng(5)
    a = np.array(list(_A))
    cells = ["".join(a[rng.integers(0, 3, size=rng.integers(2, 4))])
             for _ in range(2000)]
    out = _run(ray_session, cells, **plan)
    for c in set(cells):
        assert any(c.startswith(o) for o in out), c


# ---- uncompact -----------------------------------------------------------

def _run_un(ray, cells, precision) -> list:
    from cartwright_ray.geo.compact import uncompact_geohash
    out = uncompact_geohash(_ds(ray, cells), precision).to_pandas()
    return sorted(out["cell"])


def test_uncompact_parent_fans_out(ray_session):
    got = _run_un(ray_session, ["9q"], 3)
    assert got == sorted(f"9q{c}" for c in _A)


def test_uncompact_passthrough_and_multiplicity(ray_session):
    # a cell at target precision passes through; duplicates preserved
    got = _run_un(ray_session, ["9q5", "9q5", "dr"], 3)
    assert got.count("9q5") == 2
    assert len(got) == 2 + 32


def test_uncompact_rejects_deeper_cells(ray_session):
    import ray.exceptions
    with pytest.raises(Exception):
        _run_un(ray_session, ["9q5x"], 3)


def test_uncompact_inverts_compact_covering(ray_session):
    """uncompact(compact(S), p) == uncompact(S, p) as SETS for uniform-
    precision S (compaction preserves the covering)."""
    rng = np.random.default_rng(11)
    a = np.array(list(_A))
    cells = {"".join(a[rng.integers(0, 3, size=3)]) for _ in range(600)}
    cells |= {f"01{c}" for c in _A}                  # one complete family
    compacted = _run(ray_session, sorted(cells))
    assert set(_run_un(ray_session, sorted(compacted), 3)) == set(cells)
