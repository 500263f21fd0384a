"""S2 cell ids — vectorized implementation of the published S2 geometry
scheme (cube face + quadratic ST projection + Hilbert curve position),
following the public S2 spec: 3 face bits, 2 bits per level of Hilbert
position, trailing 1 bit marking the level.

Not verified bit-for-bit against the C++ s2geometry library (unavailable in
this environment); hierarchy/containment and geometric properties are
property-tested in ``tests/test_geo_kernels.py``.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert curve sub-cell orderings (public S2/Hilbert construction):
# kPosToIJ[orientation][pos] = ij, kPosToOrientation[pos] = orientation XOR.
_POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # canonical order
    [0, 2, 3, 1],   # axes swapped
    [3, 2, 0, 1],   # bits inverted
    [3, 1, 0, 2],   # swapped & inverted
], dtype=np.uint64)
_SWAP, _INVERT = 0x1, 0x2
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.uint64)
# inverse: kIJtoPos[orientation][ij] = pos
_IJ_TO_POS = np.zeros((4, 4), dtype=np.uint64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _xyz_from_lonlat(lon: np.ndarray, lat: np.ndarray):
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    theta = np.deg2rad(np.asarray(lon, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az),
                    np.where(x >= 0, 0, 3),
                    np.where(ay >= az,
                             np.where(y >= 0, 1, 4),
                             np.where(z >= 0, 2, 5))).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate([
        (lambda: y / x, lambda: z / x),          # face 0 (+x)
        (lambda: -x / y, lambda: z / y),         # face 1 (+y)
        (lambda: -x / z, lambda: -y / z),        # face 2 (+z)
        (lambda: z / x, lambda: y / x),          # face 3 (-x)
        (lambda: z / y, lambda: -x / y),         # face 4 (-y)
        (lambda: -y / z, lambda: -x / z),        # face 5 (-z)
    ]):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ufn()[m]
                v[m] = vfn()[m]
    return face, u, v


def _st_from_uv(u):
    """Quadratic projection (the S2 default): equal-area-ish warp."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u))


def s2_cell_id(lat: np.ndarray, lon: np.ndarray, level: int = 12) -> np.ndarray:
    """Vectorized S2 cell id (uint64) at ``level`` for lat/lon degrees."""
    assert 0 <= level <= MAX_LEVEL
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)
    lim = np.uint64((1 << MAX_LEVEL) - 1)
    i = np.clip((_st_from_uv(u) * (1 << MAX_LEVEL)).astype(np.int64), 0, int(lim)).astype(np.uint64)
    j = np.clip((_st_from_uv(v) * (1 << MAX_LEVEL)).astype(np.int64), 0, int(lim)).astype(np.uint64)

    # Hilbert position needs only the top ``level`` bits of (i, j): the
    # traversal from the root to the target level is `level` steps, and the
    # finer bits are truncated out of the cell id anyway.
    pos = np.zeros(i.shape, dtype=np.uint64)
    orient = (face.astype(np.uint64) & np.uint64(_SWAP))
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        ik = (i >> np.uint64(k)) & np.uint64(1)
        jk = (j >> np.uint64(k)) & np.uint64(1)
        ij = (ik << np.uint64(1)) | jk
        p = _IJ_TO_POS[orient.astype(np.int64), ij.astype(np.int64)]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p.astype(np.int64)]

    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (face.astype(np.uint64) << np.uint64(61)) | (pos << shift) | lsb


def s2_level(cell: np.ndarray) -> np.ndarray:
    """Level from the position of the trailing one bit."""
    cell = np.asarray(cell, dtype=np.uint64)
    tz = np.zeros(cell.shape, dtype=np.int64)
    c = cell.copy()
    for _ in range(64):
        m = (c & np.uint64(1)) == 0
        if not m.any():
            break
        tz[m] += 1
        c = c >> np.uint64(1)
        c[~m] = 1  # freeze finished lanes
    return MAX_LEVEL - tz // 2


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at the given (coarser) level — prefix truncation."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cell & ~(lsb - np.uint64(1))) | lsb


_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def s2_token_arrow(cell: np.ndarray):
    """Canonical hex tokens (16 hex digits, trailing zeros stripped) as an
    Arrow StringArray built straight from numpy buffers — no per-row
    Python (round 2: the format()/rstrip loop was an encode hot spot)."""
    import pyarrow as pa
    cell = np.asarray(cell, dtype=np.uint64)
    n = cell.shape[0]
    digs = np.empty((n, 16), dtype=np.uint8)
    run = np.ones(n, dtype=bool)           # still inside the trailing-0 run
    tz = np.zeros(n, dtype=np.int64)
    for j in range(16):
        nib = ((cell >> np.uint64(4 * j)) & np.uint64(15)).astype(np.int64)
        digs[:, 15 - j] = _HEX[nib]
        run &= nib == 0
        tz += run
    lengths = 16 - tz
    zero = lengths == 0                    # cell id 0 → token "X"
    lengths[zero] = 1
    digs[zero, 0] = ord("X")
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    total = int(starts[-1] + lengths[-1]) if n else 0
    row = np.repeat(np.arange(n), lengths)
    col = np.arange(total) - np.repeat(starts, lengths)
    values = digs[row, col]
    offsets = np.empty(n + 1, dtype=np.int32)
    offsets[0] = 0
    np.cumsum(lengths, out=offsets[1:])
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes()))


def s2_token(cell: np.ndarray) -> np.ndarray:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    return np.asarray(s2_token_arrow(cell).to_pylist(), dtype=object)
