"""Text-analysis operators over the documents table (engine-only:
language-ID, quality scoring, token counting, document fingerprinting).

All are single streaming ``map_batches`` stages. Token/char statistics use
``pyarrow.compute`` kernels (zero Python per row) so their outputs are
exactly reproducible by the DuckDB oracle SQL in ``__ray_entry__``.
Language-ID runs as an actor pool (stopword tables + compiled regexes built
once per actor).
"""

from __future__ import annotations

from ..util import _pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting + char-class quality stats (SQL-reproducible)
# ---------------------------------------------------------------------------


def text_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_chars_m, n_tokens, alpha_chars, digit_chars, space_chars,
    alpha_ratio. Definitions (mirrored in oracle SQL):

    - n_tokens: number of non-empty runs between ``\\s+`` separators
    - alpha/digit/space_chars: count of [A-Za-z] / [0-9] / [ \\t\\n\\r]
    """
    text = batch.column(col)
    n_chars = pc.utf8_length(text)
    toks = pc.split_pattern_regex(text, r"\s+")
    # count non-empty tokens: flatten, test, re-aggregate via parent indices
    flat = pc.list_flatten(toks)
    nonempty = pc.cast(pc.not_equal(flat, ""), pa.int64())
    parents = pc.list_parent_indices(toks)
    counts = np.zeros(len(batch), dtype=np.int64)
    np.add.at(counts, np.asarray(parents), np.asarray(nonempty))

    def count_class(pattern: str) -> pa.Array:
        removed = pc.replace_substring_regex(text, pattern, "")
        return pc.subtract(n_chars, pc.utf8_length(removed))

    alpha = count_class(r"[A-Za-z]")
    digit = count_class(r"[0-9]")
    space = count_class(r"[ \t\n\r]")
    ratio = pc.divide(pc.cast(alpha, pa.float64()),
                      pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()))

    out = batch.append_column("n_chars_m", pc.cast(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pa.array(counts, pa.int64()))
    out = out.append_column("alpha_chars", pc.cast(alpha, pa.int64()))
    out = out.append_column("digit_chars", pc.cast(digit, pa.int64()))
    out = out.append_column("space_chars", pc.cast(space, pa.int64()))
    out = out.append_column("alpha_ratio", ratio)
    return out


def text_stats(ds, col: str = "text"):
    return ds.map_batches(lambda b: text_stats_batch(b, col),
                          batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# language identification (stopword/char-class heuristic actor)
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "at", "by", "this", "have", "are"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "du", "que",
           "est", "dans", "pour", "qui", "sur", "pas", "avec", "au", "ce"},
    "es": {"el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
           "es", "del", "por", "con", "para", "se", "su", "al", "lo"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "im", "ein",
           "eine", "mit", "auf", "für", "nicht", "sich", "dem", "des", "zu"},
}


class LangId:
    """Actor-pool callable: stopword tables + token regex compiled once per
    actor (``__init__``), vectorized-ish scoring per batch."""

    def __init__(self):
        import re
        self.word_re = re.compile(r"[a-zA-ZÀ-ÿ]+")
        self.cjk_re = re.compile(r"[一-鿿]")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def detect(self, text: str) -> str:
        if self.cjk_re.search(text):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        best_lang, best = "und", 0
        for lang, tab in self.tables.items():
            score = sum(1 for w in words if w in tab)
            if score > best:
                best_lang, best = lang, score
        return best_lang if best > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.detect(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def detect_language(ds, concurrency: int = 4, batch_size: int = 4096):
    return ds.map_batches(LangId, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=_pool(concurrency))


# ---------------------------------------------------------------------------
# document fingerprinting (rolling-hash winnowing)
# ---------------------------------------------------------------------------

def fingerprint_batch(batch: pa.Table, col: str = "text",
                      window: int = 8, stride: int = 16) -> pa.Table:
    """Winnowing-style fingerprint: rolling 8-byte hashes (vectorized
    sliding window), min per stride window, blake2 of the min sequence."""
    import hashlib
    fps = []
    for t in batch.column(col).to_pylist():
        b = np.frombuffer(str(t).lower().encode("utf-8", "replace"), np.uint8)
        if b.size < window:
            b = np.pad(b, (0, window - b.size))
        win = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
        h = np.zeros(win.shape[0], dtype=np.uint64)
        for j in range(window):
            h = h * np.uint64(1099511628211) + win[:, j]
        n_keep = max(1, h.size // stride)
        mins = [int(h[i * stride:(i + 1) * stride].min()) for i in range(n_keep)]
        fps.append(hashlib.blake2b(np.array(mins, dtype=np.uint64).tobytes(),
                                   digest_size=8).hexdigest())
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def fingerprint(ds, col: str = "text"):
    return ds.map_batches(lambda b: fingerprint_batch(b, col),
                          batch_format="pyarrow")
