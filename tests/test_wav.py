"""WAV codec: roundtrips, stdlib-`wave` cross-oracle, chunk walking,
and the synth-spec arithmetic the SQL oracle replays."""

import io
import struct
import wave

import numpy as np
import pytest

from cartwright_ray.media.wav import wav_decode, wav_encode
from cartwright_ray.stages.media import synth_wav_params, synth_wav_payload


def _sig(n=1000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32767, size=n, dtype=np.int16)


def test_roundtrip_16bit_mono():
    s = _sig()
    dec, rate = wav_decode(wav_encode(s, sample_rate=44100))
    assert rate == 44100
    assert dec.dtype == np.int16 and np.array_equal(dec, s)


def test_roundtrip_16bit_stereo():
    s = np.stack([_sig(), -_sig()], axis=1)
    dec, rate = wav_decode(wav_encode(s, sample_rate=16000))
    assert dec.shape == s.shape and np.array_equal(dec, s)


def test_stdlib_wave_reads_our_encode():
    """Independent decoder oracle: the stdlib `wave` module must parse
    our container and recover identical frames."""
    s = np.stack([_sig(512), _sig(512, seed=9)], axis=1)
    with wave.open(io.BytesIO(wav_encode(s, sample_rate=22050))) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) \
            == (2, 2, 22050)
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(frames.reshape(-1, 2), s)


def test_our_decode_reads_stdlib_wave():
    s = _sig(768)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(s.astype("<i2").tobytes())
    dec, rate = wav_decode(buf.getvalue())
    assert rate == 8000 and np.array_equal(dec, s)


def test_8bit_decode_grid():
    s = (np.arange(-128, 128, dtype=np.int64) << 8).astype(np.int16)
    dec, _ = wav_decode(wav_encode(s, bits=8))
    assert np.array_equal(dec, s)      # values on the 8-bit grid roundtrip


def test_24bit_sign_extension():
    s = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321])
    dec, _ = wav_decode(wav_encode(s, bits=24))
    assert dec.dtype == np.int32 and np.array_equal(dec, s)


def test_float32_roundtrip():
    s = np.linspace(-1, 1, 333, dtype=np.float32)
    dec, _ = wav_decode(wav_encode(s, sample_rate=48000))
    assert dec.dtype == np.float32 and np.array_equal(dec, s)


def _inject_chunk(data: bytes, tag: bytes, body: bytes) -> bytes:
    """Splice an extra chunk between fmt and data (odd sizes get the
    RIFF pad byte), fixing up the RIFF size."""
    extra = tag + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        extra += b"\x00"
    di = data.find(b"data", 12)
    out = data[:di] + extra + data[di:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def test_unknown_chunks_and_padding_skipped():
    s = _sig(99)
    data = wav_encode(s)
    data = _inject_chunk(data, b"LIST", b"INFOisft\x05\x00\x00\x00odd!!")
    data = _inject_chunk(data, b"fact", struct.pack("<I", 99) + b"\x01")
    dec, rate = wav_decode(data)
    assert rate == 8000 and np.array_equal(dec, s)


def test_extensible_format_unwraps():
    s = _sig(64)
    data = bytearray(wav_encode(s, sample_rate=8000))
    fi = bytes(data).find(b"fmt ")
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    ext += struct.pack("<HHI", 22, 16, 0x1)        # cbSize, validBits, mask
    ext += struct.pack("<H", 1) + bytes(14)        # SubFormat GUID: PCM
    new = b"fmt " + struct.pack("<I", len(ext)) + ext
    old_len = 8 + struct.unpack("<I", bytes(data[fi + 4:fi + 8]))[0]
    data[fi:fi + old_len] = new
    data[4:8] = struct.pack("<I", len(data) - 8)
    dec, rate = wav_decode(bytes(data))
    assert rate == 8000 and np.array_equal(dec, s)


def test_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not a wave file at all....")
    data = bytearray(wav_encode(_sig(8)))
    fi = bytes(data).find(b"fmt ")
    data[fi + 8:fi + 10] = struct.pack("<H", 0x55)   # MP3 format tag
    with pytest.raises(ValueError, match="unsupported"):
        wav_decode(bytes(data))


@pytest.mark.parametrize("doc", [0, 1, 5, 12, 30, 31, 44, 1234])
def test_synth_spec_matches_decode(doc):
    """The SQL oracle's arithmetic vs a real decode of the real bytes."""
    p = synth_wav_params(doc)
    samples, rate = wav_decode(synth_wav_payload(f"media://{doc}/1"))
    ch0 = samples if samples.ndim == 1 else samples[:, 0]
    assert rate == p["sample_rate"]
    assert len(ch0) == p["n_samples"]
    assert (1 if samples.ndim == 1 else samples.shape[1]) \
        == p["n_channels"]
    assert int(np.abs(ch0.astype(np.int64)).max()) == p["amplitude"]
    s = ch0.astype(np.int64)
    zc = int(np.count_nonzero(s[:-1] * s[1:] < 0))
    assert zc == (p["n_samples"] - 1) // (p["period"] // 2)
