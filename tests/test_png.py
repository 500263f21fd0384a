"""Pure-stdlib PNG codec: round-trip all five filters + an independently
hand-constructed file (not produced by our encoder)."""

import struct
import zlib

import numpy as np
import pytest

from cartwright_ray.media.png import png_decode, png_encode


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_gray(filter_type):
    rng = np.random.default_rng(5 + filter_type)
    img = rng.integers(0, 256, (23, 17), dtype=np.uint8)
    out = png_decode(png_encode(img, filter_type=filter_type))
    assert out.shape == img.shape and (out == img).all()


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_rgb(filter_type):
    rng = np.random.default_rng(50 + filter_type)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    out = png_decode(png_encode(img, filter_type=filter_type))
    assert out.shape == img.shape and (out == img).all()


def _chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def test_decode_handcrafted():
    """2x2 grayscale built BY HAND from the spec (Up filter on row 2):
    pixels [[1, 2], [4, 6]] -> row2 filtered = (4-1, 6-2) = (3, 4)."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    scan = bytes([0, 1, 2]) + bytes([2, 3, 4])
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b""))
    out = png_decode(data)
    assert (out == np.array([[1, 2], [4, 6]], dtype=np.uint8)).all()


def test_corrupt_crc_rejected():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(png_encode(img))
    data[-5] ^= 0xFF           # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_unsupported_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)   # 16-bit depth
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(data)


def test_roundtrip_property():
    """Property: any uint8 image of any small shape round-trips through
    every filter type, gray and RGB."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(h=st.integers(1, 24), w=st.integers(1, 24),
           f=st.integers(0, 4), rgb=st.booleans(),
           seed=st.integers(0, 2**31 - 1))
    def prop(h, w, f, rgb, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = png_decode(png_encode(img, filter_type=f))
        assert out.shape == img.shape and (out == img).all()

    prop()
