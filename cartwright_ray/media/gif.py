"""Pure-stdlib GIF codec — the animated-frame container for the media
stages (public spec: GIF89a, CompuServe 1990; LZW per the spec's
variable-code-width variant).

Decode supports GIF87a/89a: logical screen descriptor, global and local
color tables, multiple image descriptors (animation frames), interlaced
images, graphic-control / comment / application extension skipping, and
full variable-width LZW with code-table growth and clear codes. Frames
composite over the logical screen per the simplest disposal model
(draw-over), which matches what the synthesizer below emits; palettes
map to grayscale via integer luma (ITU-R 601 weights, //256) so the
engine features stay integer-exact.

Encode writes one or more full-frame grayscale images with a 256-entry
global color table. The LZW stream uses the spec-legal "clear early"
strategy: emit 8-bit literal codes and a Clear code every 254 symbols so
the code width never grows — ~1 byte/pixel output, trivially correct,
and every decoder (including this one) must handle the clear codes.

LZW decode cost is per-code Python (like the JPEG entropy stage — the
honest floor without a C codec); everything else is numpy.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


def _gray_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


def _lzw_encode_flat(data: bytes) -> bytes:
    """Spec-legal LZW stream with min code size 8: literal byte codes +
    a Clear every 254 symbols keeps the width at 9 bits throughout."""
    clear, end = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for i, b in enumerate(data):
        put(b)
        if (i + 1) % 254 == 0:
            put(clear)
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode(frames, delay_cs: int = 4) -> bytes:
    """uint8 grayscale (h, w) array, or list of same-shaped arrays
    (animation), → GIF89a bytes with a grayscale global palette."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f) for f in frames]
    if any(f.dtype != np.uint8 or f.ndim != 2 for f in frames):
        raise ValueError("gif_encode expects uint8 (h, w) frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one shape")

    out = bytearray(b"GIF89a")
    # logical screen: global color table flag, 8 bits/channel, size 256
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _gray_palette()
    if len(frames) > 1:
        # NETSCAPE2.0 loop extension (standard animation marker)
        out += bytes([_EXTENSION, 0xFF, 11]) + b"NETSCAPE2.0"
        out += bytes([3, 1, 0, 0, 0])
    for f in frames:
        if len(frames) > 1:
            # graphic control: delay only, no transparency, disposal 1
            out += bytes([_EXTENSION, 0xF9, 4, 0x04]) \
                + struct.pack("<H", delay_cs) + bytes([0, 0])
        out += bytes([_IMAGE_SEP]) + struct.pack("<HHHH", 0, 0, w, h) \
            + bytes([0])                       # no local table, sequential
        out += bytes([8])                      # LZW min code size
        out += _sub_blocks(_lzw_encode_flat(f.tobytes()))
    out.append(_TRAILER)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = end + 1

    width = 0
    next_code = 0
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return bytes(out[:n_expected])
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:               # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_expected:
                return bytes(out[:n_expected])
    return bytes(out[:n_expected])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(data: bytes):
    """GIF bytes → list of uint8 grayscale (h, w) frames composited on
    the logical screen (palette → integer luma: (77R+150G+29B)//256)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(data[pos:pos + 3 * n],
                                   dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    screen = np.zeros((h, w), dtype=np.uint8)
    frames = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            pos += 1                               # label
            while data[pos]:                       # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB",
                                                data[pos:pos + 9])
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image without any color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code, iw * ih),
                            dtype=np.uint8)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF image data")
        idx = idx.reshape(ih, iw)
        if ipacked & 0x40:                          # interlaced
            de = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, ih, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        p = pal.astype(np.int64)
        luma = ((77 * p[:, 0] + 150 * p[:, 1] + 29 * p[:, 2]) // 256) \
            .astype(np.uint8)
        screen[iy:iy + ih, ix:ix + iw] = luma[idx]
        frames.append(screen.copy())
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames
