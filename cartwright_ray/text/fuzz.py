"""Fuzzy string matching (pure stdlib, vectorizable helpers).

Reproduces the scoring semantics the reference relies on
(`/root/reference/cartwright/utils.py:10-20` uses ``fuzz.ratio``;
`cartwright/categories/geos.py:24-28` uses ``fuzz.token_sort_ratio``):
``fuzz.ratio(a, b) == int(round(100 * SequenceMatcher(None, a, b).ratio()))``
in fuzzywuzzy's pure-python mode. fuzzywuzzy is absent in this environment,
so we implement the same scores on top of :mod:`difflib`.

For bulk lookups (a value against a 10^4-entry city list) use
:class:`FuzzyLookup`, which keeps normalized keys + an exact-match hash set
as the fast path and only falls back to the O(n) scan when needed.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from functools import lru_cache


def _normalize(s: str) -> str:
    return " ".join(str(s).lower().split())


def ratio(a: str, b: str) -> int:
    """fuzzywuzzy ``fuzz.ratio`` equivalent (case-sensitive, like the lib)."""
    return int(round(100 * SequenceMatcher(None, a, b).ratio()))


def fuzzy_match(a: str, b: str, threshold: int = 95) -> bool:
    """Reference ``fuzzy_match`` (`cartwright/utils.py:10-14`): lowercased
    ratio strictly greater than *threshold*."""
    return ratio(str(a).lower(), str(b).lower()) > threshold


def fuzzy_ratio(a: str, b: str) -> int:
    """Lowercased ratio (`cartwright/utils.py:17-20`)."""
    return ratio(str(a).lower(), str(b).lower())


def token_sort_ratio(a: str, b: str) -> int:
    """fuzzywuzzy ``fuzz.token_sort_ratio`` equivalent: alphabetically
    sort whitespace tokens of the lowercased strings, then ratio."""
    sa = " ".join(sorted(_normalize(a).split()))
    sb = " ".join(sorted(_normalize(b).split()))
    return ratio(sa, sb)


class FuzzyLookup:
    """Best-match lookup of one value against a fixed candidate list.

    Mirrors ``fuzzywuzzy.process.extractOne(value, candidates,
    scorer=token_sort_ratio)`` (`cartwright/categories/geos.py:23-28`) with
    an exact/normalized fast path so the common case (clean city/country
    values) costs O(1) instead of a full scan.

    Instances are built once per detector actor (``__init__`` of the
    actor-pool class) — never per batch.
    """

    def __init__(self, candidates):
        self.candidates = [str(c) for c in candidates]
        self._norm = [" ".join(sorted(_normalize(c).split())) for c in self.candidates]
        self._exact = {}
        for i, n in enumerate(self._norm):
            self._exact.setdefault(n, i)

    def best(self, value: str) -> tuple[str, int] | None:
        """Return ``(candidate, score)`` of the best match, or None if empty."""
        if not self.candidates:
            return None
        key = " ".join(sorted(_normalize(value).split()))
        hit = self._exact.get(key)
        if hit is not None:
            return self.candidates[hit], 100
        return self._scan(key)

    @lru_cache(maxsize=4096)
    def _scan(self, key: str) -> tuple[str, int]:
        best_i, best_s = 0, -1
        # difflib quick bounds: skip candidates whose length difference alone
        # caps the ratio below the current best.
        lk = len(key)
        for i, cand in enumerate(self._norm):
            lc = len(cand)
            upper = 200 * min(lk, lc) / max(1, (lk + lc))
            if upper <= best_s:
                continue
            s = ratio(key, cand)
            if s > best_s:
                best_i, best_s = i, s
                if s == 100:
                    break
        return self.candidates[best_i], best_s
