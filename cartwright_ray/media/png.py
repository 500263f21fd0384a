"""Pure-stdlib PNG codec (zlib + numpy) — the real decode path for the
media stages.

No image library exists in this container, but PNG needs none: the
format is zlib-compressed filtered scanlines in length-tagged chunks
(public spec: PNG (Portable Network Graphics) Specification, W3C/ISO
15948). Supporting 8-bit grayscale (color type 0) and RGB (2) with all
five scanline filters covers the payloads a synthetic corpus or typical
screenshot/thumbnail pipeline produces; anything else raises cleanly so
the caller can route to a richer codec off-container.

Decode cost model: unfiltering is sequential per scanline in x for Sub /
Average / Paeth (each reconstructed byte feeds the next) — rows loop in
Python but all chunk parsing, CRC checks and the None/Up filters are
vectorized. Fine for thumbnail-sized media; a SIMD unfilter drops in
behind the same signature.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit grayscale (h, w) or RGB (h, w, 3) array → PNG bytes.

    ``filter_type`` applies one filter to every scanline (0 None, 1 Sub,
    2 Up, 3 Average, 4 Paeth) — exercising decode of all five in tests.
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("png_encode expects uint8")
    if arr.ndim == 2:
        color_type, channels = 0, 1
        data = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        data = arr
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB")
    h, w = data.shape[:2]
    bpp = channels
    raw = data.reshape(h, w * channels).astype(np.int32)
    prev = np.zeros(w * channels, dtype=np.int32)
    lines = []
    for y in range(h):
        line = raw[y]
        left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            out = line
        elif filter_type == 1:
            out = line - left
        elif filter_type == 2:
            out = line - prev
        elif filter_type == 3:
            out = line - (left + prev) // 2
        elif filter_type == 4:
            out = line - _paeth(left, prev, upleft)
        else:
            raise ValueError("filter_type must be 0..4")
        lines.append(bytes([filter_type]) + (out % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for grayscale, (h, w, 3) for RGB.

    Verifies the signature and every chunk CRC; supports bit depth 8,
    color types 0 (gray) and 2 (RGB), no interlace.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type})")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = 1 if color_type == 0 else 3
    bpp = channels
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32)
    out = np.empty((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        line = lines[y]
        if f == 0:
            rec = line
        elif f == 2:
            rec = (line + prev) % 256
        elif f == 1:
            # recon[x] = raw[x] + recon[x-bpp]: per-lane prefix sum mod 256
            rec = line.reshape(-1, bpp).copy()
            np.cumsum(rec, axis=0, out=rec)
            rec = (rec % 256).reshape(-1)
        elif f in (3, 4):
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else \
                        (b if pb <= pc_ else c)
                    rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = rec
        prev = out[y]
    img = out.astype(np.uint8)
    if channels == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, 3)
