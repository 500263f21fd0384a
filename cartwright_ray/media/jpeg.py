"""Pure-stdlib baseline JPEG codec (numpy) — makes the multimodal column
real for the dominant web-image format (VERDICT r03 Next #9; the PNG
codec, ``media/png.py``, proved the pattern).

Public spec: ITU-T T.81 / ISO 10918-1 (baseline sequential DCT Annex F +
progressive DCT Annex G) with the JFIF container (ITU-T T.871). Scope —
the two profiles that together cover essentially all web JPEGs:

* 8-bit baseline sequential (SOF0/SOF1) AND progressive (SOF2) with
  full spectral selection + successive approximation (DC/AC first and
  refinement scans, EOBn runs, restarts); hierarchical/lossless/
  arithmetic SOFn variants raise ``NotImplementedError`` cleanly so
  callers can route to a richer codec off-container;
* grayscale (1 component) and YCbCr (3 components) with sampling
  factors 1 or 2 per axis — 4:4:4, 4:2:2 and 4:2:0 all decode;
* multiple DQT/DHT tables, restart markers (DRI/RSTn), APPn/COM skip;
* standard Annex K quantization + Huffman tables on the encode side
  (the encoder exists to fabricate real payloads for tests/pipelines,
  like ``png_encode``).

Cost model: Huffman entropy decode is bit-serial in Python (inherent to
pure-stdlib JPEG) but everything after entropy decode — dequantize,
inverse zigzag, IDCT, upsample, color convert — is batched numpy over
ALL blocks of a component at once (one einsum per component). Fine for
thumbnail/preview payloads; a libjpeg-backed decoder drops in behind the
same two-function signature.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (public tables from ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# zigzag order: index i of the zigzag sequence -> (row, col) flat index
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)))
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)))
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
     0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
     0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
     0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
     0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
     0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
     0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
     0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
     0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])
# AC chroma table bits from Annex K.3.2 (differs from luma)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
     0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
     0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
     0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
     0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
     0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
     0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
     0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])

# orthonormal 8-point DCT-II basis: C[k, n] = s(k) cos((2n+1)kπ/16)
_DCT8 = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _DCT8[_k] = _s * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)
del _k, _s


def _quality_scale(q_table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table (public
    formula): scale = 5000/q below 50, 200-2q above."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q_table * scale + 50) // 100
    return np.clip(t, 1, 255)


# ---------------------------------------------------------------------------
# Huffman table plumbing
# ---------------------------------------------------------------------------

def _build_decode_table(bits, values):
    """(length, code) -> value map per T.81 Annex C code assignment."""
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    dec = _build_decode_table(bits, values)
    return {v: (length, code) for (length, code), v in dec.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:                  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, surfaces RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None                    # pending marker (e.g. RSTn)

    def _fill(self):
        if self.marker is not None:
            raise EOFError("hit marker")
        d = self.data
        p = self.pos
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1]
            if nxt == 0x00:                   # stuffed literal 0xFF
                self.pos = p + 2
            else:                             # a real marker ends the data
                self.marker = nxt
                self.pos = p + 2              # consume FF + marker id
                raise EOFError("hit marker")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, table) -> int:
        length = 0
        code = 0
        while True:
            code = (code << 1) | self.read(1)
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
            if length > 16:
                raise ValueError("invalid JPEG: bad Huffman code")

    def sync_restart(self):
        """Consume an expected RSTn marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # reader stopped mid-byte; pad bits (and their stuffing)
            # separate us from the marker — scan forward for FF + id
            d, p = self.data, self.pos
            while d[p] != 0xFF or d[p + 1] == 0x00:
                p += 1
            while d[p + 1] == 0xFF:           # T.81 B.1.1.2 fill bytes
                p += 1
            self.marker = d[p + 1]
            self.pos = p + 2
        else:
            # _fill may have latched a fill byte (FF FF RSTn): resolve
            # to the real marker code that follows
            while self.marker == 0xFF:
                self.marker = self.data[self.pos]
                self.pos += 1
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("invalid JPEG: expected restart marker")
        self.marker = None


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size`-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (size, code bits) per F.1.2.1."""
    size = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << size) - 1
    return size, code


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) DCT coefficients (orthonormal)."""
    return np.einsum("ur,nrc,vc->nuv", _DCT8, blocks, _DCT8)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ur,nuv,vc->nrc", _DCT8, coefs, _DCT8)


def _component_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-pad a plane to 8x8 multiples and cut into raster-order
    blocks: returns (n_blocks, 8, 8), blocks_y, blocks_x."""
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    by, bx = H // 8, W // 8
    blocks = (padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .reshape(by * bx, 8, 8))
    return blocks, by, bx


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab, ac_tab) -> int:
    """Entropy-encode one zigzag coefficient vector; returns new DC pred."""
    dc = int(zz[0])
    size, code = _magnitude(dc - pred)
    l, c = dc_tab[size]
    bw.write(c, l)
    if size:
        bw.write(code, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            l, c = ac_tab[0xF0]               # ZRL
            bw.write(c, l)
            run -= 16
        size, code = _magnitude(v)
        l, c = ac_tab[(run << 4) | size]
        bw.write(c, l)
        bw.write(code, size)
        run = 0
    if last_nz < 63:
        l, c = ac_tab[0x00]                   # EOB
        bw.write(c, l)
    return dc


def _prepare_components(arr: np.ndarray, quality: int,
                        subsampling: str) -> dict:
    """Shared encoder front end (baseline AND progressive): color
    convert, subsample, pad to the MCU grid, forward DCT, quantize to
    zigzag-order int64 blocks. Both encoders emit the SAME quantized
    coefficients — which is exactly why a progressive round-trip must
    decode bit-identically to the baseline one (the conformance
    oracle)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError(
            "subsampling must be '4:4:4', '4:2:2' or '4:2:0'")
    h, w = arr.shape[:2]

    qt_luma = _quality_scale(_Q_LUMA, quality)
    qt_chroma = _quality_scale(_Q_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:2:0":
            # pad to even, then 2x2 box average
            He = (h + 1) // 2 * 2
            We = (w + 1) // 2 * 2
            def _down(p):
                p = np.pad(p, ((0, He - h), (0, We - w)), mode="edge")
                return (p.reshape(He // 2, 2, We // 2, 2)
                        .mean(axis=(1, 3)))
            planes = [y, _down(cb), _down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:2:2":
            # horizontal-only 2x box average (mixed h/v factors —
            # exercises the decoder's anisotropic upsample path)
            We = (w + 1) // 2 * 2
            def _downh(p):
                p = np.pad(p, ((0, 0), (0, We - w)), mode="edge")
                return p.reshape(h, We // 2, 2).mean(axis=2)
            planes = [y, _downh(cb), _downh(cr)]
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]

    h_max = max(s[0] for s in samp)
    v_max = max(s[1] for s in samp)

    # per-component blocks in raster order + per-MCU indexing
    comp_blocks = []
    comp_bxy = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        # pad plane so its block grid is a multiple of the MCU's hi x vi
        ph = (plane.shape[0] + 8 * vi - 1) // (8 * vi) * (8 * vi)
        pw = (plane.shape[1] + 8 * hi - 1) // (8 * hi) * (8 * hi)
        plane = np.pad(plane, ((0, ph - plane.shape[0]),
                               (0, pw - plane.shape[1])), mode="edge")
        blocks, by, bx = _component_blocks(plane)
        qt = qt_luma if qids[ci] == 0 else qt_chroma
        coefs = _fdct_blocks(blocks - 128.0)
        quant = np.round(coefs.reshape(-1, 64) / qt[None, :]).astype(np.int64)
        comp_blocks.append(quant[:, _ZIGZAG_INV_NAT])
        comp_bxy.append((by, bx))
    mcus_x = (w + 8 * h_max - 1) // (8 * h_max)
    mcus_y = (h + 8 * v_max - 1) // (8 * v_max)
    return {"gray": gray, "h": h, "w": w, "samp": samp, "qids": qids,
            "qt_luma": qt_luma, "qt_chroma": qt_chroma,
            "comp_blocks": comp_blocks, "comp_bxy": comp_bxy,
            "h_max": h_max, "v_max": v_max,
            "mcus_x": mcus_x, "mcus_y": mcus_y}


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """uint8 grayscale (h, w) or RGB (h, w, 3) -> baseline JFIF bytes.

    RGB converts to YCbCr (T.871); ``subsampling`` is ``"4:4:4"``,
    ``"4:2:2"`` (horizontal-only chroma downsample) or ``"4:2:0"``
    (ignored for grayscale). ``restart_interval`` > 0 emits DRI + RSTn
    markers every N MCUs (exercises the decoder's restart path)."""
    p = _prepare_components(arr, quality, subsampling)
    gray, h, w = p["gray"], p["h"], p["w"]
    samp, qids = p["samp"], p["qids"]
    qt_luma, qt_chroma = p["qt_luma"], p["qt_chroma"]
    comp_blocks, comp_bxy = p["comp_blocks"], p["comp_bxy"]
    mcus_x, mcus_y = p["mcus_x"], p["mcus_y"]
    ncomp = len(comp_blocks)

    dc_luma_enc = _build_encode_table(*_HUFF_DC_LUMA)
    ac_luma_enc = _build_encode_table(*_HUFF_AC_LUMA)
    dc_chroma_enc = _build_encode_table(*_HUFF_DC_CHROMA)
    ac_chroma_enc = _build_encode_table(*_HUFF_AC_CHROMA)

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samp[ci]
                by, bx = comp_bxy[ci]
                dc_tab = dc_luma_enc if qids[ci] == 0 else dc_chroma_enc
                ac_tab = ac_luma_enc if qids[ci] == 0 else ac_chroma_enc
                for dy in range(vi):
                    for dx in range(hi):
                        r_ = my * vi + dy
                        c_ = mx * hi + dx
                        zz = comp_blocks[ci][r_ * bx + c_]
                        preds[ci] = _encode_block(bw, zz, preds[ci],
                                                  dc_tab, ac_tab)
            mcu_count += 1
    bw.pad_to_byte()

    out = bytearray()
    out += b"\xff\xd8"                                         # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    # DQT (two tables for color, one for gray)
    # DQT bodies are in ZIGZAG order: position i carries natural index
    # _ZIGZAG[i] (the decoder inverts with nat[_ZIGZAG] = t)
    dqt = bytes([0]) + bytes(qt_luma[_ZIGZAG].tolist())
    if not gray:
        dqt += bytes([1]) + bytes(qt_chroma[_ZIGZAG].tolist())
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    # SOF0
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qids[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    def _dht(cls, tid, bits, values):
        return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    dht = _dht(0, 0, *_HUFF_DC_LUMA) + _dht(1, 0, *_HUFF_AC_LUMA)
    if not gray:
        dht += _dht(0, 1, *_HUFF_DC_CHROMA) + _dht(1, 1, *_HUFF_AC_CHROMA)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if qids[ci] == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# natural-order index of zigzag position i, and its inverse
_ZIGZAG_INV_NAT = _ZIGZAG                    # zz[i] = natural[_ZIGZAG[i]]
_ZIGZAG_NAT2ZZ = np.argsort(_ZIGZAG)         # natural j -> zigzag position


# ---------------------------------------------------------------------------
# progressive encode (T.81 Annex G) — fabricates REAL SOF2 payloads so
# the decoder's progressive paths are exercised end to end. The Annex K
# AC tables lack the EOBn (n>=1) symbols progressive EOB runs need, so
# progressive scans use a flat 8-bit AC table over all 176 symbols
# ((run,size) x 160, EOB0..EOB14, ZRL): 176/256 < 1 satisfies Kraft and
# the all-ones 8-bit code stays unused as T.81 requires.
# ---------------------------------------------------------------------------

_PROG_AC_SYMBOLS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)] + [0xF0])
_HUFF_AC_PROG = ([0] * 7 + [176] + [0] * 8, _PROG_AC_SYMBOLS)

# libjpeg's default scan scripts (jcparam.c): DC first at Al=1, spectral
# AC bands at Al=2/1, then the successive-approximation refinements.
_PROG_SCANS_GRAY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]
_PROG_SCANS_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
]


def _nb_dims(prep: dict, ci: int) -> tuple[int, int]:
    """Non-interleaved block grid of component ``ci`` (must mirror the
    decoder's ``_alloc_progressive`` exactly)."""
    hi, vi = prep["samp"][ci]
    nbx = (-(-prep["w"] * hi // prep["h_max"]) + 7) // 8
    nby = (-(-prep["h"] * vi // prep["v_max"]) + 7) // 8
    return nby, nbx


def _emit_eobrun(bw: _BitWriter, ac_enc, st: dict) -> None:
    if st["eobrun"] > 0:
        nbits = st["eobrun"].bit_length() - 1
        l, c = ac_enc[nbits << 4]
        bw.write(c, l)
        if nbits:
            bw.write(st["eobrun"] - (1 << nbits), nbits)
        st["eobrun"] = 0
        for b in st["pending"]:
            bw.write(b, 1)
        st["pending"] = []


def _emit_prog_restart(bw: _BitWriter, rst: int) -> None:
    bw.pad_to_byte()
    bw.out += bytes([0xFF, 0xD0 + (rst & 7)])


def _encode_prog_dc(bw, prep, comp_idxs, ah, al, dc_encs,
                    restart_interval) -> None:
    blocks, bxy = prep["comp_blocks"], prep["comp_bxy"]
    samp = prep["samp"]
    preds = {ci: 0 for ci in comp_idxs}

    def one(ci, idx):
        dc = int(blocks[ci][idx][0])
        if ah == 0:
            v = dc >> al                      # DC point transform (G.1.2.1)
            size, code = _magnitude(v - preds[ci])
            preds[ci] = v
            l, c_ = dc_encs[ci][size]
            bw.write(c_, l)
            if size:
                bw.write(code, size)
        else:                                 # refinement: raw bit
            bw.write((dc >> al) & 1, 1)

    n = rst = 0
    if len(comp_idxs) > 1:                    # interleaved MCU order
        for my in range(prep["mcus_y"]):
            for mx in range(prep["mcus_x"]):
                if restart_interval and n and n % restart_interval == 0:
                    _emit_prog_restart(bw, rst)
                    rst += 1
                    for ci in comp_idxs:
                        preds[ci] = 0
                for ci in comp_idxs:
                    hi, vi = samp[ci]
                    bx = bxy[ci][1]
                    for dy in range(vi):
                        for dx in range(hi):
                            one(ci, (my * vi + dy) * bx + mx * hi + dx)
                n += 1
    else:
        ci = comp_idxs[0]
        nby, nbx = _nb_dims(prep, ci)
        bx = bxy[ci][1]
        for row in range(nby):
            for col in range(nbx):
                if restart_interval and n and n % restart_interval == 0:
                    _emit_prog_restart(bw, rst)
                    rst += 1
                    preds[ci] = 0
                one(ci, row * bx + col)
                n += 1


def _encode_prog_ac(bw, prep, ci, ss, se, ah, al, ac_enc,
                    restart_interval) -> None:
    """One AC scan (first pass when ``ah == 0``, refinement otherwise) —
    the encoder mirror of the decode algorithms in
    ``_decode_progressive_scan`` (T.81 G.1.2.2 / G.1.2.3)."""
    blocks = prep["comp_blocks"][ci]
    bx = prep["comp_bxy"][ci][1]
    nby, nbx = _nb_dims(prep, ci)
    st = {"eobrun": 0, "pending": []}
    n = rst = 0
    for row in range(nby):
        for col in range(nbx):
            if restart_interval and n and n % restart_interval == 0:
                _emit_eobrun(bw, ac_enc, st)
                _emit_prog_restart(bw, rst)
                rst += 1
            n += 1
            zz = blocks[row * bx + col]
            if ah == 0:                       # first pass over the band
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = (v if v >= 0 else -v) >> al
                    if t == 0:
                        r += 1
                        continue
                    _emit_eobrun(bw, ac_enc, st)
                    while r > 15:
                        l, c_ = ac_enc[0xF0]
                        bw.write(c_, l)
                        r -= 16
                    size, code = _magnitude(t if v >= 0 else -t)
                    l, c_ = ac_enc[(r << 4) | size]
                    bw.write(c_, l)
                    bw.write(code, size)
                    r = 0
                if r > 0:
                    st["eobrun"] += 1
                    if st["eobrun"] == 0x7FFF:
                        _emit_eobrun(bw, ac_enc, st)
                continue
            # refinement pass: absv 0 = zero history, 1 = newly
            # visible at this precision, >=2 = history (gets a
            # correction bit)
            absv = [(int(zz[k]) if zz[k] >= 0 else -int(zz[k])) >> al
                    for k in range(ss, se + 1)]
            eob = -1                          # last newly-visible index
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob = k
            r = 0
            br_bits: list = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    _emit_eobrun(bw, ac_enc, st)
                    l, c_ = ac_enc[0xF0]
                    bw.write(c_, l)
                    r -= 16
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                if t > 1:                     # history: correction bit
                    br_bits.append(t & 1)
                    continue
                _emit_eobrun(bw, ac_enc, st)
                l, c_ = ac_enc[(r << 4) | 1]
                bw.write(c_, l)
                bw.write(1 if zz[k] >= 0 else 0, 1)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                st["eobrun"] += 1
                st["pending"] += br_bits
                if st["eobrun"] == 0x7FFF:
                    _emit_eobrun(bw, ac_enc, st)
    _emit_eobrun(bw, ac_enc, st)


def jpeg_encode_progressive(arr: np.ndarray, quality: int = 90,
                            subsampling: str = "4:4:4",
                            restart_interval: int = 0,
                            scans: list | None = None) -> bytes:
    """uint8 grayscale (h, w) or RGB (h, w, 3) -> PROGRESSIVE (SOF2)
    JFIF bytes. Same color/subsample/DCT/quantize front end as
    :func:`jpeg_encode`, so the decoded image is bit-identical to the
    baseline encoding at the same settings — the conformance oracle.

    ``scans`` is a list of ``(comp_idxs, Ss, Se, Ah, Al)`` tuples (the
    libjpeg default script when None): DC scans (Ss=0) may interleave
    components; AC scans are single-component per T.81 G.1.1.1.1."""
    p = _prepare_components(arr, quality, subsampling)
    gray, h, w = p["gray"], p["h"], p["w"]
    if scans is None:
        scans = _PROG_SCANS_GRAY if gray else _PROG_SCANS_COLOR

    dc_luma_enc = _build_encode_table(*_HUFF_DC_LUMA)
    dc_chroma_enc = _build_encode_table(*_HUFF_DC_CHROMA)
    dc_encs = [dc_luma_enc if q == 0 else dc_chroma_enc
               for q in p["qids"]]
    ac_prog_enc = _build_encode_table(*_HUFF_AC_PROG)

    out = bytearray()
    out += b"\xff\xd8"                                         # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    dqt = bytes([0]) + bytes(p["qt_luma"][_ZIGZAG].tolist())
    if not gray:
        dqt += bytes([1]) + bytes(p["qt_chroma"][_ZIGZAG].tolist())
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    ncomp = len(p["comp_blocks"])
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = p["samp"][ci]
        sof += bytes([ci + 1, (hi << 4) | vi, p["qids"][ci]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def _dht(cls, tid, bits, values):
        return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    dht = _dht(0, 0, *_HUFF_DC_LUMA) + _dht(1, 0, *_HUFF_AC_PROG)
    if not gray:
        dht += _dht(0, 1, *_HUFF_DC_CHROMA)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for comp_idxs, ss, se, ah, al in scans:
        if ss > 0 and len(comp_idxs) != 1:
            raise ValueError("progressive AC scans are single-component")
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            dc_tid = 0 if p["qids"][ci] == 0 else 1
            sos += bytes([ci + 1, (dc_tid << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BitWriter()
        if ss == 0:
            _encode_prog_dc(bw, p, comp_idxs, ah, al, dc_encs,
                            restart_interval)
        else:
            _encode_prog_ac(bw, p, comp_idxs[0], ss, se, ah, al,
                            ac_prog_enc, restart_interval)
        bw.pad_to_byte()
        out += bw.out
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JFIF bytes -> uint8
    array: (h, w) for grayscale, (h, w, 3) RGB for YCbCr. Raises
    ``NotImplementedError`` for hierarchical / lossless / arithmetic
    SOFn, ``ValueError`` for malformed streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    while True:
        if data[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        marker = data[pos + 1]
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code; skip them (same handling as media._jfif_frame_end).
        while marker == 0xFF:
            pos += 1
            if pos + 1 >= len(data):
                raise ValueError("invalid JPEG: truncated at fill bytes")
            marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                    # EOI
            if frame is not None and "h_max" in frame:
                # progressive: every scan has accumulated into the
                # coefficient planes — reconstruct once, at the end
                return _reconstruct(frame, qtables)
            raise ValueError("invalid JPEG: no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                          # standalone
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:                    # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    t = np.frombuffer(body[i:i + 64],
                                      dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    t = np.frombuffer(body[i:i + 128],
                                      dtype=">u2").astype(np.int64)
                    i += 128
                nat = np.empty(64, np.int64)
                nat[_ZIGZAG] = t              # de-zigzag to natural order
                qtables[tq] = nat
        elif marker == 0xC4:                  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                values = list(body[i + 17:i + 17 + n])
                htables[(cls, tid)] = _build_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xDD:                  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):    # baseline / ext seq / prog
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            fh, fw = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0/1) "
                "and progressive (SOF2) are supported by the pure-stdlib "
                "codec")
        elif marker == 0xDA:                  # SOS — scan follows
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for si in range(ns):
                cs, tabs = body[1 + 2 * si], body[2 + 2 * si]
                scan_tabs[cs] = (tabs >> 4, tabs & 0x0F)
            pos += seglen
            if not frame["progressive"]:
                return _decode_scan(data, pos, frame, scan_tabs, qtables,
                                    htables, restart_interval)
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah = body[3 + 2 * ns] >> 4
            al = body[3 + 2 * ns] & 0x0F
            if "h_max" not in frame:          # first scan: allocate
                _alloc_progressive(frame)
            pos = _decode_progressive_scan(
                data, pos, frame, scan_tabs, ss, se, ah, al, htables,
                restart_interval)
            continue
        # APPn / COM / anything else: skip
        pos += seglen


def _decode_scan(data, pos, frame, scan_tabs, qtables, htables,
                 restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit and the declared sampling factors do not
        # shape the scan (real-world grayscale JPEGs sometimes declare
        # (2,2) here)
        comps[0]["h"] = comps[0]["v"] = 1
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcus_x = (w + 8 * h_max - 1) // (8 * h_max)
    mcus_y = (h + 8 * v_max - 1) // (8 * v_max)

    for c in comps:
        c["bx"] = mcus_x * c["h"]
        c["by"] = mcus_y * c["v"]
        c["coefs"] = np.zeros((c["by"] * c["bx"], 64), dtype=np.int64)
        dc_tid, ac_tid = scan_tabs[c["id"]]
        c["dc"] = htables[(0, dc_tid)]
        c["ac"] = htables[(1, ac_tid)]

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.sync_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.read_huff(c["dc"])
                        diff = _extend(br.read(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_huff(c["ac"])
                            r_, s_ = rs >> 4, rs & 0x0F
                            if s_ == 0:
                                if r_ == 15:
                                    k += 16   # ZRL
                                    continue
                                break         # EOB
                            k += r_
                            if k > 63:
                                raise ValueError("invalid JPEG: AC overrun")
                            zz[k] = _extend(br.read(s_), s_)
                            k += 1
                        r_idx = my * c["v"] + dy
                        c_idx = mx * c["h"] + dx
                        c["coefs"][r_idx * c["bx"] + c_idx] = zz
            mcu_count += 1

    return _reconstruct({"h": h, "w": w, "comps": comps}, qtables)


def _reconstruct(frame, qtables) -> np.ndarray:
    """Shared post-entropy reconstruction: dequantize, inverse zigzag,
    IDCT, upsample, color convert — batched numpy per component. Serves
    both the baseline scan and the progressive multi-scan accumulator."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        qt = qtables[c["tq"]]
        nat = np.zeros((c["coefs"].shape[0], 64), dtype=np.float64)
        nat[:, _ZIGZAG] = c["coefs"]          # inverse zigzag
        nat *= qt[None, :]
        pix = _idct_blocks(nat.reshape(-1, 8, 8)) + 128.0
        by, bx = c["by"], c["bx"]
        plane = (pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by * 8, bx * 8))
        planes.append(plane)

    if len(comps) == 1:
        out = np.clip(np.round(planes[0][:h, :w]), 0, 255)
        return out.astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = v_max // c["v"], h_max // c["h"]
        if ry > 1 or rx > 1:                  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decode (T.81 Annex G: spectral selection + successive
# approximation). Coefficients accumulate across scans in zigzag order;
# _reconstruct runs once at EOI.
# ---------------------------------------------------------------------------

def _alloc_progressive(frame) -> None:
    comps = frame["comps"]
    if len(comps) == 1:
        # T.81 A.2.2: single-component frames scan non-interleaved;
        # declared sampling factors do not shape the data (same rule the
        # baseline path applies)
        comps[0]["h"] = comps[0]["v"] = 1
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    frame["h_max"], frame["v_max"] = h_max, v_max
    frame["mcus_x"] = (frame["w"] + 8 * h_max - 1) // (8 * h_max)
    frame["mcus_y"] = (frame["h"] + 8 * v_max - 1) // (8 * v_max)
    for c in comps:
        c["bx"] = frame["mcus_x"] * c["h"]
        c["by"] = frame["mcus_y"] * c["v"]
        c["coefs"] = np.zeros((c["by"] * c["bx"], 64), dtype=np.int64)
        c["pred"] = 0
        # non-interleaved (single-component scan) block grid: covers the
        # COMPONENT's own dimensions, not the interleaved MCU padding
        # (T.81 A.2.2) — ceil(ceil(dim * sampling / max) / 8)
        c["nbx"] = (-(-frame["w"] * c["h"] // h_max) + 7) // 8
        c["nby"] = (-(-frame["h"] * c["v"] // v_max) + 7) // 8


def _resume_pos(br: "_BitReader") -> int:
    """Byte position of the marker that terminated a progressive scan's
    entropy data (the outer segment loop resumes there)."""
    if br.marker is not None:
        return br.pos - 2
    d, p = br.data, br.pos
    while d[p] != 0xFF or d[p + 1] == 0x00:
        p += 1                                # pad bits / stuffing tail
    return p


def _refine_nonzero(br, zz, k, se, p1, m1, stop_run: int | None):
    """G.1.2.3 correction-bit walk: advance from ``k`` reading one
    correction bit per NONZERO-history coefficient; zero-history
    positions count down ``stop_run`` (the run length before a new
    coefficient / ZRL span) — returns the stop index (or se+1)."""
    while k <= se:
        if zz[k]:
            if br.read(1) and not (zz[k] & p1):
                zz[k] += p1 if zz[k] >= 0 else m1
        else:
            if stop_run is not None:
                if stop_run == 0:
                    return k
                stop_run -= 1
        k += 1
    return k


def _decode_progressive_scan(data, pos, frame, scan_tabs, ss, se, ah, al,
                             htables, restart_interval) -> int:
    comps = frame["comps"]
    in_scan = [c for c in comps if c["id"] in scan_tabs]
    br = _BitReader(data, pos)
    p1, m1 = 1 << al, -1 << al
    eobrun = 0

    if ss == 0:                               # DC scan (first or refine)
        if se != 0:
            raise ValueError("invalid JPEG: DC scan with Se != 0")
        if ah == 0:
            for c in in_scan:
                c["dc"] = htables[(0, scan_tabs[c["id"]][0])]
                c["pred"] = 0

        def dc_block(c, idx):
            zz = c["coefs"][idx]
            if ah == 0:
                s = br.read_huff(c["dc"])
                diff = _extend(br.read(s), s) if s else 0
                c["pred"] += diff
                zz[0] = c["pred"] << al
            else:                             # refinement: one raw bit
                zz[0] |= br.read(1) << al

        if len(in_scan) > 1:                  # interleaved over MCUs
            n = 0
            for my in range(frame["mcus_y"]):
                for mx in range(frame["mcus_x"]):
                    if restart_interval and n and \
                            n % restart_interval == 0:
                        br.sync_restart()
                        for c in in_scan:
                            c["pred"] = 0
                    for c in in_scan:
                        for dy in range(c["v"]):
                            for dx in range(c["h"]):
                                dc_block(c, (my * c["v"] + dy) * c["bx"]
                                         + mx * c["h"] + dx)
                    n += 1
        else:
            c = in_scan[0]
            n = 0
            for r in range(c["nby"]):
                for col in range(c["nbx"]):
                    if restart_interval and n and \
                            n % restart_interval == 0:
                        br.sync_restart()
                        c["pred"] = 0
                    dc_block(c, r * c["bx"] + col)
                    n += 1
        return _resume_pos(br)

    # AC scan: single component, non-interleaved (T.81 G.1.1.1.1)
    if len(in_scan) != 1:
        raise ValueError("invalid JPEG: interleaved progressive AC scan")
    c = in_scan[0]
    ac = htables[(1, scan_tabs[c["id"]][1])]
    n = 0
    for row in range(c["nby"]):
        for col in range(c["nbx"]):
            if restart_interval and n and n % restart_interval == 0:
                br.sync_restart()
                eobrun = 0
            n += 1
            zz = c["coefs"][row * c["bx"] + col]
            if ah == 0:                       # first pass over the band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.read_huff(ac)
                    r_, s_ = rs >> 4, rs & 0x0F
                    if s_ == 0:
                        if r_ == 15:          # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r_) - 1
                        if r_:
                            eobrun += br.read(r_)
                        break
                    k += r_
                    if k > se:
                        raise ValueError("invalid JPEG: AC overrun")
                    zz[k] = _extend(br.read(s_), s_) << al
                    k += 1
                continue
            # refinement pass (G.1.2.3 decode side)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = br.read_huff(ac)
                    r_, s_ = rs >> 4, rs & 0x0F
                    val = 0
                    if s_:
                        if s_ != 1:
                            raise ValueError(
                                "invalid JPEG: refinement size != 1")
                        val = p1 if br.read(1) else m1
                    elif r_ != 15:            # EOBn: run covers this
                        eobrun = 1 << r_      # block's tail too
                        if r_:
                            eobrun += br.read(r_)
                        break
                    # advance over r_ zero-history slots, correcting
                    # nonzero-history ones along the way; the walk stops
                    # AT the (r_+1)-th zero-history slot — the new
                    # coefficient's home for s_=1, the 16th skipped slot
                    # for ZRL (r_=15, s_=0; k+=1 below consumes it)
                    k = _refine_nonzero(br, zz, k, se, p1, m1, r_)
                    if s_ and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                _refine_nonzero(br, zz, k, se, p1, m1, None)
                eobrun -= 1
    return _resume_pos(br)
