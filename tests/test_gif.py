"""GIF codec: lossless grayscale roundtrips, animation, LZW growth,
interlace, and malformed-input rejection. No Ray session needed."""

import struct

import numpy as np
import pytest

from cartwright_ray.media.gif import gif_decode, gif_encode


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def test_single_frame_lossless():
    img = _gradient(16, 16)
    frames = gif_decode(gif_encode(img))
    assert len(frames) == 1
    assert np.array_equal(frames[0], img)   # grayscale palette: exact


def test_animation_roundtrip():
    frames = [_gradient(12, 17, seed=i) for i in range(5)]
    dec = gif_decode(gif_encode(frames, delay_cs=10))
    assert len(dec) == 5
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)


def test_odd_sizes_and_extremes():
    for shape in [(1, 1), (1, 300), (37, 3)]:
        img = _gradient(*shape, seed=sum(shape))
        assert np.array_equal(gif_decode(gif_encode(img))[0], img)
    flat = np.full((8, 8), 255, dtype=np.uint8)
    assert np.array_equal(gif_decode(gif_encode(flat))[0], flat)


def test_lzw_code_width_growth_decodes():
    """A growing-width LZW stream (real compressors emit these): build
    one by hand — repetitive data with NO early clears so the table
    grows past 512 entries and the decoder must widen 9→10+ bits."""
    # encode with a real (growing) LZW for this test
    data = bytes(np.tile(np.arange(64, dtype=np.uint8), 200))
    clear, end = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    codes = [clear]
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        codes.append(table[seq])
        table[cand] = next_code
        next_code += 1
        seq = bytes([b])
    codes.append(table[seq])
    codes.append(end)
    out = bytearray()
    acc = nbits = 0
    next_code = 258
    width = 9
    emitted = [clear]
    # re-emit with width tracking mirroring the decoder's growth rule
    out = bytearray()
    acc = nbits = 0
    n2 = 258
    width = 9
    first = True
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c not in (clear, end):
            if first:
                first = False
            else:
                n2 += 1
                if n2 == (1 << width) and width < 12:
                    width += 1
    if nbits:
        out.append(acc & 0xFF)

    h, w = 1, len(data)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    gif += bytes(v for i in range(256) for v in (i, i, i))
    gif += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0, 8])
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        gif.append(len(chunk))
        gif += chunk
    gif += bytes([0, 0x3B])
    dec = gif_decode(bytes(gif))
    assert np.array_equal(dec[0][0], np.frombuffer(data, dtype=np.uint8))


def test_interlaced_image_decodes():
    img = _gradient(16, 8, seed=3)
    data = bytearray(gif_encode(img))
    # single-frame layout: header(13) + global palette(768) → image
    # descriptor (0x2C can also occur INSIDE the palette, so compute the
    # offset structurally rather than scanning for the byte)
    sep = 13 + 768
    assert data[sep] == 0x2C
    # flip the interlace bit and splice in row-reordered pixel data
    data[sep + 9] |= 0x40
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(s, 16, st)]
    inner = bytearray(gif_encode(img[order]))
    assert inner[sep] == 0x2C
    data[sep + 10:] = inner[sep + 10:]
    dec = gif_decode(bytes(data))
    assert np.array_equal(dec[0], img)


def test_rejects_garbage():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG?nope........")
    with pytest.raises(ValueError):
        gif_encode(np.zeros((4, 4), dtype=np.float32))


def test_frame_sampler_gif_real(ray_session):
    """Video frame-sampling through the real GIF path: sampled frames
    carry dims + the exact constant pixel value, re-encoded as PNGs."""
    import pyarrow as pa
    import ray.data

    from cartwright_ray.media.png import png_decode
    from cartwright_ray.stages.media import (FrameSampler,
                                             media_rows_from_corpus)

    spans = pa.array([
        [{"kind": "media", "text": "", "media_ref": "media://9/1",
          "offset": 0}],
    ])
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["9"]), "spans": spans}))
    media = media_rows_from_corpus(corpus, payload_kind="gif")
    out = media.map_batches(FrameSampler,
                            fn_constructor_kwargs={"decoder": "gif"},
                            batch_format="pyarrow",
                            concurrency=1).to_pandas()
    assert sorted(out["frame_idx"]) == [0, 4, 8, 12]
    for _, r in out.iterrows():
        want = (9 * 7 + int(r["frame_idx"]) * 13) % 256
        assert r["pixel_value"] == want
        px = png_decode(bytes(r["payload"]))
        assert px.shape == (16, 16) and (px == want).all()
