"""Vectorized geohash encoding (standard public algorithm: interleave
lon/lat bisection bits, base-32 alphabet)."""

from __future__ import annotations

import numpy as np

_BASE32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)


def _spread_bits30(x: np.ndarray) -> np.ndarray:
    """Spread the low 30 bits of x so bit i lands at position 2i
    (Morton/Z-order magic masks on uint64)."""
    x = x.astype(np.uint64) & np.uint64((1 << 30) - 1)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def geohash_uint(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """60-bit interleaved geohash integer (lon bit first, the standard)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lat_i = np.clip(((lat + 90.0) / 180.0) * (1 << 30), 0, (1 << 30) - 1).astype(np.uint64)
    lon_i = np.clip(((lon + 180.0) / 360.0) * (1 << 30), 0, (1 << 30) - 1).astype(np.uint64)
    return (_spread_bits30(lon_i) << np.uint64(1)) | _spread_bits30(lat_i)


def _squash_bits30(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits30: collect bits at even positions."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


_CHAR_TO_VAL = np.full(128, 255, dtype=np.uint8)
for _i, _c in enumerate(b"0123456789bcdefghjkmnpqrstuvwxyz"):
    _CHAR_TO_VAL[_c] = _i


def geohash_decode(hashes) -> tuple[np.ndarray, np.ndarray]:
    """Geohash strings → (lat, lon) cell centers, vectorized per length."""
    hashes = np.asarray(hashes, dtype=object)
    lat = np.full(hashes.shape, np.nan)
    lon = np.full(hashes.shape, np.nan)
    lengths = np.array([len(h) if isinstance(h, str) else 0 for h in hashes])
    for p in np.unique(lengths):
        if p == 0:
            continue
        idx = np.nonzero(lengths == p)[0]
        chars = np.frombuffer("".join(hashes[i] for i in idx).encode("ascii"),
                              dtype=np.uint8).reshape(len(idx), p)
        vals = _CHAR_TO_VAL[chars].astype(np.uint64)
        g = np.zeros(len(idx), dtype=np.uint64)
        for c in range(p):
            g = (g << np.uint64(5)) | vals[:, c]
        g = g << np.uint64(60 - 5 * p)
        lon_i = _squash_bits30(g >> np.uint64(1))
        lat_i = _squash_bits30(g)
        nbits = 5 * int(p)
        lon_bits = (nbits + 1) // 2
        lat_bits = nbits // 2
        # cell center = quantized prefix + half a cell
        lon[idx] = ((lon_i >> np.uint64(30 - lon_bits)).astype(np.float64) + 0.5) \
            / (1 << lon_bits) * 360.0 - 180.0
        lat[idx] = ((lat_i >> np.uint64(30 - lat_bits)).astype(np.float64) + 0.5) \
            / (1 << lat_bits) * 180.0 - 90.0
    return lat, lon


def _geohash_bytes(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    assert 1 <= precision <= 12
    g = geohash_uint(lat, lon)
    n = g.shape[0]
    out = np.empty((n, precision), dtype=np.uint8)
    for c in range(precision):
        shift = np.uint64(60 - 5 * (c + 1))
        out[:, c] = _BASE32[((g >> shift) & np.uint64(31)).astype(np.int64)]
    return out


def geohash_encode_arrow(lat: np.ndarray, lon: np.ndarray,
                         precision: int = 9):
    """Geohash strings as an Arrow StringArray built straight from the
    fixed-width byte matrix — no numpy-unicode / Python-object round trip
    (round 2 encode fast path)."""
    import pyarrow as pa
    out = _geohash_bytes(lat, lon, precision)
    n = out.shape[0]
    offsets = (np.arange(n + 1, dtype=np.int32) * precision)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(np.ascontiguousarray(out).tobytes()))


def geohash_encode(lat: np.ndarray, lon: np.ndarray, precision: int = 9) -> np.ndarray:
    """Geohash strings at the given precision (chars), vectorized.

    Returns a numpy array of fixed-length byte strings decoded to ``<U``.
    """
    out = _geohash_bytes(lat, lon, precision)
    return out.view(f"S{precision}").ravel().astype(str)


def geohash_neighbors(hashes, precision: int | None = None) -> np.ndarray:
    """(n, 8) neighbor geohashes of each cell (E, W, N, S, NE, NW, SE,
    SW order), vectorized: decode to cell centers, step by one cell size
    in each direction (longitude wraps at the antimeridian), re-encode.
    Neighbors past the poles repeat the cell itself (the standard edge
    convention: the N row at the top of the map has no northern
    neighbor).

    All input hashes must share one precision (pass ``precision`` to
    assert it); mixed-precision batches should be grouped by length
    first — neighbor steps are precision-dependent.
    """
    hashes = np.asarray(hashes, dtype=object)
    if len(hashes) == 0:
        return np.empty((0, 8), dtype=object)
    p = len(hashes[0])
    if precision is not None and p != precision:
        raise ValueError(f"expected precision {precision}, got {p}")
    if any(len(h) != p for h in hashes):
        raise ValueError("mixed-precision input; group by length first")
    lat, lon = geohash_decode(hashes)
    nbits = 5 * p
    lat_step = 180.0 / (1 << (nbits // 2))
    lon_step = 360.0 / (1 << ((nbits + 1) // 2))
    out = np.empty((len(hashes), 8), dtype=object)
    for j, (dy, dx) in enumerate(((0, 1), (0, -1), (1, 0), (-1, 0),
                                  (1, 1), (1, -1), (-1, 1), (-1, -1))):
        nlat = lat + dy * lat_step
        nlon = (lon + dx * lon_step + 180.0) % 360.0 - 180.0
        off_pole = np.abs(nlat) >= 90.0
        nlat = np.where(off_pole, lat, nlat)
        out[:, j] = geohash_encode(nlat, np.where(off_pole, lon, nlon), p)
    return out
