"""image_dhash / image_dhash_dedup — perceptual image dedup."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.media.png import png_encode
from cartwright_ray.stages.imagehash import (dhash64, image_dhash,
                                             image_dhash_dedup)


def _img(seed, shape=(16, 16)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, shape).astype(np.uint8)


def test_dhash_brightness_invariance_and_sensitivity():
    base = (_img(1) // 2).astype(np.uint8)       # 0..127: no clipping
    brighter = (base + 40).astype(np.uint8)      # uniform +40 shift
    assert dhash64(base) == dhash64(brighter)    # gradient signs kept
    assert dhash64(_img(2)) != dhash64(base)     # different image


def test_dhash_pool_shapes():
    # non-16x16 inputs go through area-mean pooling
    a = _img(3, (32, 24))
    assert 0 <= dhash64(a) < 2 ** 64
    assert dhash64(a) == dhash64(a)


def test_dedup_finds_planted_clones():
    rows = []
    for i in range(30):
        payload = png_encode(_img(100 + i))
        rows.append({"doc_id": str(i), "span_idx": 1,
                     "media_ref": f"m://{i}", "payload": payload})
    # clones: docs 40..44 reuse images 0..4
    for j in range(5):
        rows.append({"doc_id": str(40 + j), "span_idx": 1,
                     "media_ref": f"m://c{j}",
                     "payload": png_encode(_img(100 + j))})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    pairs = image_dhash_dedup(image_dhash(ds, decoder="png",
                                          concurrency=2)).to_pandas()
    pairs = pairs.sort_values("dup_id").reset_index(drop=True)
    assert list(pairs["dup_id"]) == [40, 41, 42, 43, 44]
    assert list(pairs["kept_id"]) == [0, 1, 2, 3, 4]


def test_dedup_multimember_group_keeps_min():
    payload = png_encode(_img(7))
    rows = [{"doc_id": str(i), "span_idx": 1, "media_ref": f"m://{i}",
             "payload": payload} for i in (5, 2, 9)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    pairs = image_dhash_dedup(image_dhash(ds, decoder="png",
                                          concurrency=1)).to_pandas()
    pairs = pairs.sort_values("dup_id").reset_index(drop=True)
    assert list(pairs["dup_id"]) == [5, 9]
    assert list(pairs["kept_id"]) == [2, 2]
