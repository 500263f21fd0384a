"""Pure-stdlib RIFF/WAVE codec — the real decode path for audio media.

No audio library exists in this container, but canonical WAV needs
none: the format is raw PCM (or IEEE-float) frames inside length-tagged
RIFF chunks (public spec: Microsoft/IBM "Multimedia Programming
Interface and Data Specifications 1.0", 1991; RFC 2361 WAVE format
registry). Supporting PCM 8/16/24-bit and IEEE float32, mono or
multi-channel, with proper chunk walking (LIST/fact/bext skipped,
odd-size pad bytes honored, WAVE_FORMAT_EXTENSIBLE unwrapped) covers
what a scraped-audio corpus stores; anything else raises cleanly so the
caller can route to a richer codec off-container.

Everything is vectorized: sample (de)serialization is a single
``np.frombuffer`` / ``astype`` per payload (24-bit goes through one
strided uint8 view), so decode cost is O(bytes) memcpy-bound — unlike
the JPEG path there is no bit-serial stage.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


def wav_encode(samples: np.ndarray, sample_rate: int = 8000,
               bits: int = 16) -> bytes:
    """Sample array → canonical RIFF/WAVE bytes.

    ``samples`` is ``(n,)`` mono or ``(n, ch)`` interleave-ready. Integer
    input encodes as PCM at ``bits`` ∈ {8, 16, 24}; float input ignores
    ``bits`` and encodes as IEEE float32 (format tag 3). 8-bit PCM is
    unsigned-biased per the spec; 16/24-bit are little-endian signed.
    """
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("expected (n,) or (n, ch) samples")
    n, ch = samples.shape

    if np.issubdtype(samples.dtype, np.floating):
        fmt, bits = _FMT_IEEE_FLOAT, 32
        body = np.ascontiguousarray(samples, dtype="<f4").tobytes()
    elif bits == 16:
        fmt = _FMT_PCM
        body = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    elif bits == 8:
        fmt = _FMT_PCM
        # integer input is int16-scale; 8-bit stores the biased top byte
        # (the exact inverse of decode's de-bias + shift)
        body = ((samples.astype(np.int64) >> 8) + 128) \
            .astype(np.uint8).tobytes()
    elif bits == 24:
        fmt = _FMT_PCM
        as32 = np.ascontiguousarray(samples, dtype="<i4")
        # little-endian: low three of each int32's four bytes
        body = as32.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    else:
        raise ValueError("bits must be 8, 16 or 24 for integer samples")

    block_align = ch * (bits // 8)
    fmt_body = struct.pack("<HHIIHH", fmt, ch, sample_rate,
                           sample_rate * block_align, block_align, bits)
    data = bytearray()
    data += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    data += b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        data += b"\x00"                       # RIFF word-alignment pad
    return (b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE"
            + bytes(data))


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ``(samples, sample_rate)``.

    ``samples`` is ``(n,)`` for mono, ``(n, ch)`` otherwise, in the
    container's native width: int16 for 8/16-bit PCM (8-bit is
    de-biased and shifted to the int16 grid), int32 for 24-bit PCM
    (sign-extended), float32 for IEEE-float. Unknown chunks (LIST,
    fact, bext, cue …) are skipped; WAVE_FORMAT_EXTENSIBLE resolves
    through its SubFormat GUID prefix.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = None
    body = None
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        chunk = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
            if fmt[0] == _FMT_EXTENSIBLE:
                if size < 40:
                    raise ValueError("extensible fmt chunk too short")
                # cbSize(2) validBits(2) channelMask(4) SubFormat GUID —
                # the format tag is the GUID's first two bytes
                sub = struct.unpack("<H", chunk[24:26])[0]
                fmt = (sub,) + fmt[1:]
        elif tag == b"data":
            body = chunk
        pos += 8 + size + (size % 2)          # odd chunks carry a pad byte
    if fmt is None or body is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, _, _, bits = fmt
    if ch < 1:
        raise ValueError("invalid channel count")

    if tag == _FMT_PCM and bits == 16:
        out = np.frombuffer(body[:len(body) // 2 * 2], dtype="<i2")
        out = out.astype(np.int16)
    elif tag == _FMT_PCM and bits == 8:
        u = np.frombuffer(body, dtype=np.uint8)
        out = ((u.astype(np.int16) - 128) << 8).astype(np.int16)
    elif tag == _FMT_PCM and bits == 24:
        raw = np.frombuffer(body[:len(body) // 3 * 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3)
        out = (raw[:, 0].astype(np.int32)
               | (raw[:, 1].astype(np.int32) << 8)
               | (raw[:, 2].astype(np.int32) << 16))
        out -= (out & 0x800000) << 1          # sign-extend bit 23
    elif tag == _FMT_IEEE_FLOAT and bits == 32:
        out = np.frombuffer(body[:len(body) // 4 * 4], dtype="<f4")
        out = out.astype(np.float32)
    else:
        raise ValueError(
            f"unsupported WAVE format tag={tag} bits={bits} "
            "(PCM 8/16/24 and IEEE float32 are supported; route other "
            "encodings to a richer codec off-container)")

    frames = len(out) // ch
    out = out[:frames * ch]
    return (out if ch == 1 else out.reshape(frames, ch)), rate
