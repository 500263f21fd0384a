"""URL normalization kernel cases + dedup plans over messy URLs."""

import pyarrow as pa
import pytest

from cartwright_ray.stages.urls import normalize_url_array

CASES = [
    # every rule at once: case, default port, trailing slash before
    # query, tracking param first, fragment
    ("HTTPS://Site0.EXAMPLE:443/p0/?utm_source=s0&id=0#sec0",
     "https://site0.example/p0?id=0"),
    ("https://site1.example/p1?id=1", "https://site1.example/p1?id=1"),
    ("HTTPS://site3.example/p3?id=3&ref=rss",
     "https://site3.example/p3?id=3"),
    ("http://H.example:80/x/", "http://h.example/x"),
    ("http://h.example:8080/x", "http://h.example:8080/x"),  # non-default kept
    ("https://h.example:80/x", "https://h.example:80/x"),    # wrong scheme kept
    ("https://h.example/p/?id=2&ref=rss#z", "https://h.example/p?id=2"),
    ("https://h.example/p/?utm_source=a", "https://h.example/p"),
    ("https://h.example/p?utm_a=1&utm_b=2&id=3&ref=x",
     "https://h.example/p?id=3"),
    ("https://h.example", "https://h.example"),
    ("ftp://Files.Example/Dir/", "ftp://files.example/Dir"),  # path case kept
    ("not a url", None),
    ("", None),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_normalize_cases(raw, want):
    assert normalize_url_array(pa.array([raw])).to_pylist() == [want]


def test_normalize_is_idempotent():
    raws = pa.array([c[0] for c in CASES if c[1] is not None])
    once = normalize_url_array(raws)
    twice = normalize_url_array(once)
    assert once.to_pylist() == twice.to_pylist()


@pytest.mark.parametrize("plan", ["broadcast", "shuffle"])
def test_url_dedup_plans_agree(ray_session, plan):
    """Both physical plans keep exactly min-doc_id per normal form, and
    unparseable URLs (null key) all survive."""
    import ray.data

    from cartwright_ray.stages.urls import synth_messy_urls, url_dedup

    n = 500
    docs = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    out = url_dedup(synth_messy_urls(docs), plan=plan).to_pandas()
    # ground truth: min doc_id per (d%5, d%7, d%4)
    seen, keep = set(), []
    for d in range(n):
        key = (d % 5, d % 7, d % 4)
        if key not in seen:
            seen.add(key)
            keep.append(d)
    assert sorted(out["doc_id"]) == keep
    assert (out["url_norm"]
            == out["doc_id"].map(lambda d: f"https://site{d % 5}.example"
                                           f"/p{d % 7}?id={d % 4}")).all()


def test_url_dedup_null_keys_survive(ray_session):
    import ray.data

    from cartwright_ray.stages.urls import url_dedup

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "url": ["junk", "junk", "https://a.example/x",
                "HTTPS://A.EXAMPLE/x"]}))
    out = url_dedup(docs).to_pandas().sort_values("doc_id")
    # both junk rows survive (null keys never collide); one of the two
    # equivalent URLs survives (the min id)
    assert list(out["doc_id"]) == [1, 2, 3]
    assert out["url_norm"].isna().sum() == 2   # sentinel never leaks


def test_path_ampersand_untouched():
    """'&' is legal in URL paths: it must never be rewritten to '?', and
    two URLs differing only path-'&' vs query-'?' stay distinct."""
    got = normalize_url_array(pa.array([
        "https://h.example/a&b",
        "https://h.example/a?b=1",
        "https://h.example/a&b?utm_source=x&id=1",
        "https://h.example/a&b?utm_source=x",
        "https://h.example/p?",
    ])).to_pylist()
    assert got == ["https://h.example/a&b",
                   "https://h.example/a?b=1",
                   "https://h.example/a&b?id=1",
                   "https://h.example/a&b",
                   "https://h.example/p"]


def test_component_anchoring_advice_r04():
    """ADVICE r04: the rewrites must be anchored to their component.
    A '&ref='/'&utm_*=' substring inside a PATH segment, and '/?' or a
    trailing '/' inside a query VALUE, are real URL content — the old
    single-string rule chain rewrote all three, silently canonicalizing
    distinct URLs identically (false dedup drops)."""
    got = normalize_url_array(pa.array([
        "https://h.example/a&ref=b/c",            # path '&ref=' kept
        "https://h.example/a&utm_x=1/c",          # path '&utm_*=' kept
        "https://h.example/x?next=/foo/?bar",     # '/?' in query value
        "https://h.example/x?p=/tmp/",            # trailing '/' in value
        "https://h.example/x?p=/tmp/&ref=r",      # ...even next to a real
                                                  # tracking param
        "https://h.example/a&ref=b/?utm_y=2&id=1",  # both at once
    ])).to_pylist()
    assert got == ["https://h.example/a&ref=b/c",
                   "https://h.example/a&utm_x=1/c",
                   "https://h.example/x?next=/foo/?bar",
                   "https://h.example/x?p=/tmp/",
                   "https://h.example/x?p=/tmp/",
                   "https://h.example/a&ref=b?id=1"]


def test_multiple_leading_tracking_params():
    got = normalize_url_array(pa.array([
        "https://h.example/p?utm_a=1&utm_b=2&id=3",
        "https://h.example/p?utm_a=1&ref=x",
        "https://h.example/p?ref=x&utm_a=1&q=2&utm_b=3",
    ])).to_pylist()
    assert got == ["https://h.example/p?id=3",
                   "https://h.example/p",
                   "https://h.example/p?q=2"]
