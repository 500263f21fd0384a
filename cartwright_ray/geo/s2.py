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


def s2_token(cell: np.ndarray) -> np.ndarray:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    cell = np.asarray(cell, dtype=np.uint64)
    out = []
    for c in cell:
        h = format(int(c), "016x").rstrip("0")
        out.append(h if h else "X")
    return np.array(out, dtype=object)
