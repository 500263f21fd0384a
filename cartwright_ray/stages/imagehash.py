"""Perceptual image hashing + image-level dedup — the multimodal
analogue of text fingerprinting (LAION-style near-duplicate image
removal runs exactly this shape: decode → tiny grayscale thumbnail →
bit signature → bucket by signature).

The signature here is a 64-bit difference hash (dHash family): the
decoded grayscale image is average-pooled to 8×8 (exact integer block
means for the 16×16 synth payloads; area-mean for other sizes) and
bit (r, c) is ``pooled[r, (c+1) % 8] > pooled[r, c]`` — the horizontal
gradient sign with row wraparound, giving all 64 bits from one 8×8
grid. Gradient-sign hashes are stable under brightness/contrast
shifts, which is why production pipelines prefer them to raw-pixel
hashes.

Stages:
- :func:`image_dhash` — actor-pool ``map_batches`` (decode state and
  codec dispatch built once per actor): payload → ``dhash`` int64
  (bit-reinterpreted uint64, the engine's standard for hash columns).
- :func:`image_dhash_dedup` — identical-signature grouping via ONE
  narrow sort exchange of ``(dhash, doc_id, span_idx)`` rows +
  whole-block segment kernel (equal keys are co-located by the range
  sort, the same contract as ``dedup._exact_dedup_shuffle``); each
  group emits (dup, kept=min-id) pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..media.jpeg import jpeg_decode
from ..media.png import png_decode
from ..util import _pool


def dhash64(img: np.ndarray) -> int:
    """Grayscale float/uint8 2-D image → 64-bit difference hash (as a
    Python int in [0, 2^64)). Pooling is area-mean to 8×8."""
    h, w = img.shape
    img = img.astype(np.float64)
    # area-mean pooling: exact block means when 8 | h and 8 | w
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    pooled = np.empty((8, 8))
    for r in range(8):
        rows = img[ys[r]:ys[r + 1]]
        for c in range(8):
            pooled[r, c] = rows[:, xs[c]:xs[c + 1]].mean()
    bits = pooled[:, (np.arange(8) + 1) % 8] > pooled
    return int(np.packbits(bits.reshape(-1)).view(">u8")[0])


class ImageDHash:
    """Actor-pool stage: decode + dHash per media row."""

    def __init__(self, decoder: str = "png"):
        # codecs are MODULE-TOP imports: a lazy relative import here
        # fails on workers that don't inherit the repo sys.path (the
        # driver-lineage bug class — caught by the lineage sweep)
        self._decode = {"png": png_decode, "jpeg": jpeg_decode}[decoder]

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = np.empty(batch.num_rows, np.uint64)
        payloads = batch.column("payload").to_pylist()
        for i, payload in enumerate(payloads):
            img = self._decode(payload)
            if img.ndim == 3:
                img = img.mean(axis=2)
            hashes[i] = dhash64(img)
        out = batch.select(["doc_id", "span_idx", "media_ref"])
        return out.append_column(
            "dhash", pa.array(hashes.view(np.int64)))


def image_dhash(media_ds, decoder: str = "png", concurrency: int = 2,
                batch_size: int = 64):
    """→ (doc_id, span_idx, media_ref, dhash int64)."""
    return media_ds.map_batches(
        ImageDHash, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(concurrency))


def image_dhash_dedup(hash_ds, id_col: str = "doc_id"):
    """Identical-signature image dedup: for every dhash carried by more
    than one document, emit (dup_id, kept_id) pairs with kept = the
    smallest id. → (dup_id, kept_id, dhash), ids as int64."""
    import pyarrow.compute as pc

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({
            "dhash": t["dhash"],
            "id": pc.cast(t[id_col], pa.int64())})

    def pairs_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dup_id": pa.array([], pa.int64()),
                             "kept_id": pa.array([], pa.int64()),
                             "dhash": pa.array([], pa.int64())})
        h = np.asarray(t["dhash"])
        i = np.asarray(t["id"])
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        seg = np.cumsum(np.r_[False, h[1:] != h[:-1]])
        first = np.zeros(len(h), bool)
        first[starts] = True
        kept = i[starts][seg]
        return pa.table({"dup_id": pa.array(i[~first]),
                         "kept_id": pa.array(kept[~first]),
                         "dhash": pa.array(h[~first])})

    return (hash_ds.map_batches(narrow, batch_format="pyarrow")
                   .sort("dhash")
                   .map_batches(pairs_block, batch_format="pyarrow",
                                batch_size=None))
