"""Web-mercator (slippy map) tile math — standard public formulas."""

from __future__ import annotations

import numpy as np

MAX_LAT = 85.05112877980659  # web-mercator latitude clamp


def lonlat_to_tile(lon: np.ndarray, lat: np.ndarray, zoom: int):
    """(lon, lat) → (x, y) tile indices at ``zoom`` (int32 arrays).

    x = floor((lon+180)/360 * 2^z);
    y = floor((1 - asinh(tan φ)/π)/2 * 2^z), φ clamped to ±85.051°.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    n = float(1 << zoom)
    x = np.floor((lon + 180.0) / 360.0 * n)
    phi = np.deg2rad(lat)
    y = np.floor((1.0 - np.arcsinh(np.tan(phi)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int32)
    y = np.clip(y, 0, n - 1).astype(np.int32)
    return x, y


def tile_quadkey(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """Bing-style quadkey strings for (x, y, z) — handy partition keys."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    out = np.empty((x.shape[0], zoom), dtype=np.uint8)
    for i in range(zoom):
        shift = np.uint64(zoom - 1 - i)
        digit = ((x >> shift) & np.uint64(1)) | (((y >> shift) & np.uint64(1)) << np.uint64(1))
        out[:, i] = digit.astype(np.uint8) + ord("0")
    return out.view(f"S{zoom}").ravel().astype(str) if zoom else np.full(x.shape, "", dtype=object)
