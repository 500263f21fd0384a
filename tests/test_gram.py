"""gram_matrix — numpy brute differential, layout invariance, PSD and
count invariants."""

import numpy as np
import pandas as pd

import ray.data

from cartwright_ray.stages.gram import FP_SCALE, gram_matrix


def test_matches_brute_and_layout():
    rng = np.random.default_rng(7)
    n, d = 300, 16
    x = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"embedding": list(x)})

    xq = np.floor(x.astype(np.float64) * FP_SCALE).astype(np.int64)
    g = xq.T @ xq
    iu, ju = np.triu_indices(d)
    want = pd.DataFrame({
        "i": np.r_[np.int64(0), iu + 1],
        "j": np.r_[np.int64(0), ju + 1],
        "g": np.r_[np.int64(n), g[iu, ju]]}) \
        .sort_values(["i", "j"]).reset_index(drop=True)

    for blocks in (1, 7):
        got = gram_matrix(ray.data.from_pandas(df).repartition(blocks),
                          dim=d)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # PSD sanity: reconstruct the full matrix, all eigenvalues >= 0
    full = np.zeros((d, d), np.float64)
    body = want[want.i > 0]
    full[body.i - 1, body.j - 1] = body.g
    full[body.j - 1, body.i - 1] = body.g
    assert np.linalg.eigvalsh(full).min() > -1e-6 * abs(full).max()
