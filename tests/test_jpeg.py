"""Baseline JPEG codec (media/jpeg.py): roundtrip closeness, an
independent test-side reconstruction oracle, marker features (restart,
subsampling), and clean rejection of unsupported profiles."""

import numpy as np
import pytest

from cartwright_ray.media.jpeg import (_quality_scale, _Q_LUMA, _ZIGZAG,
                                       jpeg_decode, jpeg_encode)


def _gradient(h, w):
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    y = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    return ((x + y) / 2).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (24, 17), (9, 31)])
@pytest.mark.parametrize("quality", [95, 75, 50])
def test_gray_roundtrip_close(shape, quality):
    img = _gradient(*shape)
    dec = jpeg_decode(jpeg_encode(img, quality=quality))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth gradients quantize almost losslessly at these qualities
    assert err.max() <= {95: 2, 75: 4, 50: 6}[quality]


def test_noise_roundtrip_bounded():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=90))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 40 and err.mean() <= 10   # worst-case content


def _reference_reconstruction(img, quality):
    """Independent (textbook-loop) DCT → quantize → dequantize → IDCT of a
    block-aligned grayscale image — what a correct decoder must return,
    to within float-rounding of the IDCT."""
    qt = _quality_scale(_Q_LUMA, quality).astype(np.float64)
    h, w = img.shape
    out = np.zeros((h, w))
    n = np.arange(8)
    C = np.where(n == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    basis = C[:, None] * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = basis @ blk @ basis.T
            q = np.round(coef / qt.reshape(8, 8))
            rec = basis.T @ (q * qt.reshape(8, 8)) @ basis
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = rec + 128.0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [90, 60])
def test_decode_matches_independent_reconstruction(quality):
    """The only lossy step is quantization: decode(encode(img)) must
    equal an independently computed DCT/quant/IDCT reconstruction to
    within 1 intensity level (float rounding at x.5 boundaries)."""
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 256, (16, 24)).astype(np.uint8) // 2 + 64) \
        .astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=quality))
    want = _reference_reconstruction(img, quality)
    assert np.abs(dec.astype(int) - want.astype(int)).max() <= 1


def test_restart_markers_do_not_change_pixels():
    img = _gradient(32, 24)
    base = jpeg_decode(jpeg_encode(img, quality=85))
    for ri in (1, 2, 5):
        data = jpeg_encode(img, quality=85, restart_interval=ri)
        assert b"\xff\xdd" in data            # DRI present
        assert np.array_equal(jpeg_decode(data), base)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_rgb_roundtrip(sub):
    img = _gradient(24, 17)
    rgb = np.stack([img, 255 - img, np.full_like(img, 128)], axis=2)
    dec = jpeg_decode(jpeg_encode(rgb, quality=90, subsampling=sub))
    assert dec.shape == rgb.shape
    err = np.abs(dec.astype(int) - rgb.astype(int))
    # subsampled modes lose chroma detail by design; luma stays tight
    assert err.max() <= (20 if sub != "4:4:4" else 6)


def test_gray_with_22_sampling_factors_decodes():
    """Real-world grayscale JPEGs sometimes declare (2,2) sampling in
    SOF0; a single-component scan is non-interleaved per T.81 A.2.2, so
    the factors must be ignored."""
    img = _gradient(16, 16)
    data = bytearray(jpeg_encode(img, quality=90))
    idx = bytes(data).find(b"\xff\xc0")
    # SOF0 component spec: [len(2) prec(1) h(2) w(2) nc(1) id(1) hv(1)...]
    assert data[idx + 11] == 0x11             # encoder wrote (1,1)
    data[idx + 11] = 0x22                     # declare (2,2)
    dec = jpeg_decode(bytes(data))
    assert np.array_equal(dec, jpeg_decode(jpeg_encode(img, quality=90)))


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code. Byte stuffing guarantees FF DA / FF D9 never appear inside
    entropy-coded data, so every occurrence is a real marker we can pad
    in front of. Regression: the marker loop used to read the fill byte
    as a marker code and die with IndexError."""
    from cartwright_ray.media.jpeg import jpeg_encode_progressive

    px = _gradient(24, 17)
    for data in (jpeg_encode(px, quality=85),
                 jpeg_encode_progressive(px, quality=85)):
        want = jpeg_decode(data)
        padded = data.replace(b"\xff\xda", b"\xff\xff\xda")  # every SOS
        padded = padded[:-2] + b"\xff\xff" + padded[-2:]     # before EOI
        assert np.array_equal(jpeg_decode(padded), want)


def test_fill_bytes_before_restart_markers_are_skipped():
    """Fill bytes are also legal before RSTn markers INSIDE entropy
    data (same T.81 clause); both sync_restart branches (marker latched
    by _fill vs mid-byte forward scan) must resolve through them."""
    from cartwright_ray.media.jpeg import jpeg_encode_progressive

    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    px = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    for data in (jpeg_encode(px, quality=85, restart_interval=2),
                 jpeg_encode_progressive(px, quality=85,
                                         restart_interval=2)):
        want = jpeg_decode(data)
        padded = data
        for n in range(8):                    # pad every RSTn id
            padded = padded.replace(bytes([0xFF, 0xD0 + n]),
                                    bytes([0xFF, 0xFF, 0xD0 + n]))
        assert np.array_equal(jpeg_decode(padded), want)


def test_lossless_rejected_cleanly():
    data = bytearray(jpeg_encode(_gradient(8, 8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC3                      # SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="SOF3"):
        jpeg_decode(bytes(data))


# ---------------------------------------------------------------------------
# progressive (SOF2) — the entropy layer is lossless, so a progressive
# encoding of the same quantized coefficients must decode bit-identically
# to the baseline encoding: the conformance oracle for Annex G
# ---------------------------------------------------------------------------

def _assert_prog_equals_baseline(px, quality=90, subsampling="4:4:4",
                                 **kw):
    from cartwright_ray.media.jpeg import jpeg_encode_progressive

    base = jpeg_decode(jpeg_encode(px, quality, subsampling))
    data = jpeg_encode_progressive(px, quality, subsampling, **kw)
    assert data[3] == 0xE0 and b"\xff\xc2" in data      # really SOF2
    assert np.array_equal(jpeg_decode(data), base)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_progressive_color_matches_baseline(subsampling):
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (33, 31, 3), dtype=np.uint8)
    _assert_prog_equals_baseline(px, subsampling=subsampling)


def test_progressive_gray_and_single_block():
    _assert_prog_equals_baseline(_gradient(8, 8))
    _assert_prog_equals_baseline(_gradient(24, 17), quality=50)


def test_progressive_long_eob_runs():
    """Near-flat images drive EOBRUN far past 1 — the EOBn symbol and
    cross-block correction-bit buffering paths on both sides."""
    px = np.full((128, 96, 3), 130, np.uint8)
    px[5, 7] = (135, 128, 140)
    _assert_prog_equals_baseline(px, quality=85)
    _assert_prog_equals_baseline(px[..., 0], quality=85)


def test_progressive_restart_markers():
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    px = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    _assert_prog_equals_baseline(px, restart_interval=2)
    px3 = np.stack([px, 255 - px, np.roll(px, 9, 1)], axis=2)
    _assert_prog_equals_baseline(px3, subsampling="4:2:0",
                                 restart_interval=3)


def test_progressive_custom_scan_scripts():
    """Spectral-selection-only, deep successive-approximation chains,
    and split AC bands all reconstruct exactly."""
    rng = np.random.default_rng(29)
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    spectral = [([0, 1, 2], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
                ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    deep = [([0, 1, 2], 0, 0, 0, 3), ([0, 1, 2], 0, 0, 3, 2),
            ([0, 1, 2], 0, 0, 2, 1), ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2),
            ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
            ([1], 1, 63, 0, 2), ([1], 1, 63, 2, 1), ([1], 1, 63, 1, 0),
            ([2], 1, 63, 0, 1), ([2], 1, 63, 1, 0)]
    bands = [([0, 1, 2], 0, 0, 0, 1), ([0, 1, 2], 0, 0, 1, 0),
             ([0], 1, 2, 0, 1), ([0], 3, 9, 0, 1), ([0], 10, 63, 0, 1),
             ([0], 1, 63, 1, 0),
             ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    for scans in (spectral, deep, bands):
        _assert_prog_equals_baseline(px, scans=scans)


def test_progressive_media_stage_features_match_baseline(ray_session):
    """The jpeg_progressive payload kind flows through the SAME actor
    stage and must produce features identical to the baseline kind."""
    import pyarrow as pa
    import ray.data

    from cartwright_ray.stages.media import (extract_media_features,
                                             media_rows_from_corpus)

    spans = pa.array([[{"kind": "media", "text": None,
                        "media_ref": f"media://{d}/1"}] for d in (3, 8)])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["3", "8"]), "spans": spans}))
    feats = {}
    for kind in ("jpeg", "jpeg_progressive"):
        rows = media_rows_from_corpus(
            ray.data.from_arrow(pa.table({
                "doc_id": pa.array(["3", "8"]), "spans": spans})),
            payload_kind=kind)
        df = extract_media_features(rows, decoder="jpeg").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        feats[kind] = df
    for a, b in zip(feats["jpeg"]["feature"],
                    feats["jpeg_progressive"]["feature"]):
        assert list(a) == list(b)


def test_non_jpeg_rejected():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")


def test_quality_affects_size_monotonically():
    img = np.abs(np.subtract.outer(np.arange(64), np.arange(64))) \
        .astype(np.uint8) * 4
    sizes = [len(jpeg_encode(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[2]                # higher quality, more bytes


def test_media_stage_jpeg_decoder(ray_session):
    """The decode seam end to end: real JFIF payloads through the
    feature-extract actor stage."""
    import pyarrow as pa
    import ray.data

    from cartwright_ray.stages.media import (MediaFeatureExtractor,
                                             media_rows_from_corpus)

    spans = pa.array([
        [{"kind": "media", "text": "", "media_ref": "m://1", "offset": 0}],
        [{"kind": "text", "text": "hi", "media_ref": "", "offset": 0},
         {"kind": "media", "text": "", "media_ref": "m://2", "offset": 1}],
    ])
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b"]), "spans": spans}))
    media = media_rows_from_corpus(corpus, payload_kind="jpeg")
    feats = media.map_batches(
        MediaFeatureExtractor, fn_constructor_kwargs={"decoder": "jpeg"},
        batch_format="pyarrow", batch_size=8,
        concurrency=(1, 2)).to_pandas()
    assert len(feats) == 2
    assert all(len(f) == 64 for f in feats["feature"])
    # features come from REAL decoded pixels: nonconstant across refs
    assert not np.allclose(feats["feature"].iloc[0],
                           feats["feature"].iloc[1])


def test_mjpeg_split_exact():
    """EOI-marker splitting recovers the exact frame byte ranges —
    including frames whose entropy data contains stuffed 0xFF bytes."""
    from cartwright_ray.stages.media import mjpeg_split, synth_mjpeg_payload

    rng = np.random.default_rng(3)
    frames = [jpeg_encode(rng.integers(0, 256, (16, 16), dtype=np.uint8),
                          quality=95) for _ in range(7)]
    got = mjpeg_split(b"".join(frames))
    assert got == frames
    payload = synth_mjpeg_payload("media://15/1")
    parts = mjpeg_split(payload)
    assert len(parts) == 16 and b"".join(parts) == payload
    for p in parts:
        assert jpeg_decode(p).shape == (16, 16)


def test_mjpeg_split_header_ffd9_not_a_boundary():
    """ADVICE r04: a header segment may legally contain the FF D9 byte
    pair (here: a COM comment, and a DQT whose values include 255 then
    217). A literal-EOI scanner splits mid-frame; the marker walk must
    return whole frames that still decode."""
    rng = np.random.default_rng(7)
    px = [rng.integers(0, 256, (16, 16), dtype=np.uint8)
          for _ in range(3)]
    frames = []
    for p in px:
        f = jpeg_encode(p, quality=90)
        assert f[:2] == b"\xff\xd8"
        # inject a COM segment right after SOI whose body contains FF D9
        com = b"\xff\xfe" + (6).to_bytes(2, "big") + b"ab\xff\xd9"
        frames.append(f[:2] + com + f[2:])
    from cartwright_ray.stages.media import mjpeg_split

    payload = b"".join(frames)
    parts = mjpeg_split(payload)
    assert parts == frames
    for p_in, part in zip(px, parts):
        assert np.array_equal(jpeg_decode(part), jpeg_decode(
            jpeg_encode(p_in, quality=90)))


def test_frame_sampler_mjpeg_real(ray_session):
    """Video frame-sampling with the REAL split + decode path."""
    import pyarrow as pa
    import ray.data

    from cartwright_ray.stages.media import (FrameSampler,
                                             media_rows_from_corpus)

    spans = pa.array([
        [{"kind": "media", "text": "", "media_ref": "m://7", "offset": 0}],
    ])
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a"]), "spans": spans}))
    media = media_rows_from_corpus(corpus, payload_kind="mjpeg")
    out = media.map_batches(FrameSampler,
                            fn_constructor_kwargs={"decoder": "mjpeg"},
                            batch_format="pyarrow",
                            concurrency=1).to_pandas()
    assert sorted(out["frame_idx"]) == [0, 4, 8, 12]
    assert (out["width"] == 16).all() and (out["height"] == 16).all()
    # sampled payloads are the original frame bytes, individually decodable
    for p in out["payload"]:
        assert jpeg_decode(bytes(p)).shape == (16, 16)
