"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Written from the published spec to close the last declared codec stub in
:mod:`multimodal`: no codec library exists in this container, and the
reference pipeline's raster outputs are opaque binaries to the engine
anyway — what the 100-TB pipeline needs is a REAL compressed container it
can decode inside ``mapInPandas`` tasks. Supported:

* encode: 8-bit grayscale / RGB, quality-scaled Annex K quantization
  tables, standard Annex K Huffman tables, 4:4:4 (``subsample=False``) or
  4:2:0 (``subsample=True``) chroma;
* decode: baseline (SOF0/1) interleaved scans AND progressive (SOF2,
  Huffman, Annex G: DC/AC first + successive-approximation refinement
  scans, EOB runs, per-scan restart handling), arbitrary DQT/DHT tables
  from the stream, component sampling factors up to 2x2 (covers 4:4:4,
  4:2:2, 4:2:0), restart markers (DRI/RSTn); 12-bit extended
  sequential (SOF1, grayscale, 16-bit DQT, extended-range DHT) decodes
  too; differential progressive/lossless frames and arithmetic coding
  raise ``NotImplementedError`` (declared, not silently wrong).
* hierarchical (Annex J): ``encode_jpeg_hierarchical`` + decode — DHP,
  half-resolution SOF0 base frame, EXP(1,1) midpoint expansion,
  full-resolution differential SOF5 frame (no level shift), grayscale.
* ``encode_jpeg_ext12``: 12-bit grayscale extended-sequential writer
  (level shift 2048, Pq=1 quantization, DC categories to 15 / AC sizes
  to 14 via in-stream extended Huffman tables).
* lossless (SOF3, Annex H): ``encode_jpeg_lossless`` + decode — all
  seven predictors, 2..16-bit precision (12-bit science pixels
  included), point transform, mod-2^16 difference coding with the
  SSSS=16 escape; restart intervals in lossless scans are declared
  unsupported.
* ``encode_jpeg_progressive``: SOF2 writer (DC Al=1 → per-component AC
  bands → DC refinement) whose reconstruction is bit-identical to the
  baseline encoding of the same image.

The DCT/IDCT are exact float64 8x8 matrix products (not the fast integer
approximations) — bit-for-bit reproducible across platforms, which matters
more here than raw speed: determinism is what the oracle checks lean on.
Python-level bit I/O makes this a test/metadata-scale codec; the Spark-side
plumbing (Arrow batches, schema, partitioning) is the part that scales.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

# Annex K.1/K.2 base quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# zig-zag scan order (spec Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# exact 8x8 DCT-II basis: C[u,x] = a(u) * cos((2x+1) u pi / 16)
_DCT = np.array([[
    (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
    * np.cos((2 * x + 1) * u * np.pi / 16)
    for x in range(8)] for u in range(8)])


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (the de-facto standard mapping 1..100)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


# ----------------------------------------------------------------- huffman


def _build_codes(bits, values):
    """(value -> (code, length)) from a DHT spec — canonical Huffman
    (spec Annex C code assignment)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, values):
    """((length, code) -> value) lookup for decode."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:      # byte stuffing (spec F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (spec E.1.4)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n % 8)])


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1    # stuffed
                else:
                    # marker: rewind and present 1-bits (decoder stops at EOB)
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:   # trailing pad
            self.acc <<= (n - self.nbits)
            self.nbits = n
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code")

    def align(self) -> None:
        self.nbits -= self.nbits % 8

    def skip_rst(self) -> None:
        """Consume an RSTn marker at the current byte position."""
        self.align()
        self.acc &= (1 << self.nbits) - 1
        # the 0xFF D0-D7 pair may be in the accumulator or the stream
        if self.nbits >= 16:
            top = (self.acc >> (self.nbits - 16)) & 0xFFFF
            if 0xFFD0 <= top <= 0xFFD7:
                self.nbits -= 16
                return
        while self.pos < len(self.data) - 1:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.acc = 0
                self.nbits = 0
                return
            self.pos += 1


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


# ------------------------------------------------------------------ encode


def _encode_block(block, qt, dc_codes, ac_codes, pred, out):
    """block: 8x8 float (level-shifted). Returns new DC predictor."""
    coef = _DCT @ block @ _DCT.T
    q = np.round(coef / qt).astype(np.int32)
    zz = q.flatten()[ZIGZAG]
    dc = int(zz[0])
    cat, bits = _magnitude(dc - pred)
    code, length = dc_codes[cat]
    out.write(code, length)
    out.write(bits, cat)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]   # ZRL
            out.write(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        out.write(code, length)
        out.write(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]       # EOB
        out.write(code, length)
    return dc


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _split_components(arr: np.ndarray, subsample: bool):
    """uint8 image -> (gray, h, w, level-shifted YCbCr planes)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [arr.astype(np.float64) - 128.0]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down2(c):
                hh, ww = (c.shape[0] + 1) // 2 * 2, (c.shape[1] + 1) // 2 * 2
                p = np.pad(c, ((0, hh - c.shape[0]), (0, ww - c.shape[1])),
                           mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            comps = [y - 128.0, down2(cb) - 128.0, down2(cr) - 128.0]
        else:
            comps = [y - 128.0, cb - 128.0, cr - 128.0]
    return gray, h, w, comps


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Baseline JFIF: 8-bit grayscale (2-D or HxWx1) or RGB (HxWx3);
    ``subsample=True`` writes 4:2:0 chroma (2x2 luma sampling factors);
    ``restart_interval`` > 0 emits DRI + RSTn every N MCUs (the segmenting
    real encoders use so a corrupted segment doesn't poison the scan)."""
    gray, h, w, comps = _split_components(arr, subsample)

    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    dc_l, ac_l = _build_codes(*HT_DC_LUMA), _build_codes(*HT_AC_LUMA)
    dc_c, ac_c = _build_codes(*HT_DC_CHROMA), _build_codes(*HT_AC_CHROMA)

    out = bytearray(b"\xff\xd8")                                 # SOI
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, b"\x00" + bytes(qt_l.flatten()[ZIGZAG].tolist()))
    if not gray:
        out += _marker(0xFFDB, b"\x01" + bytes(qt_c.flatten()[ZIGZAG].tolist()))

    hs = 2 if (subsample and not gray) else 1
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (hs << 4) | hs, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _marker(0xFFC0, sof)                                  # SOF0

    def dht(klass, ident, spec):
        bits, vals = spec
        return _marker(0xFFC4, bytes([(klass << 4) | ident])
                       + bytes(bits) + bytes(vals))
    out += dht(0, 0, HT_DC_LUMA) + dht(1, 0, HT_AC_LUMA)
    if not gray:
        out += dht(0, 1, HT_DC_CHROMA) + dht(1, 1, HT_AC_CHROMA)

    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))  # DRI

    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xFFDA, sos)                                  # SOS

    bw = _BitWriter()
    mcu_h, mcu_w = 8 * hs, 8 * hs
    mcus_y = (h + mcu_h - 1) // mcu_h
    mcus_x = (w + mcu_w - 1) // mcu_w
    padded = []
    for ci, c in enumerate(comps):
        f = hs if ci == 0 else 1
        ph, pw = mcus_y * 8 * f, mcus_x * 8 * f
        padded.append(np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])),
                             mode="edge"))
    preds = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                bw.restart(rst_n)
                rst_n += 1
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(padded):
                f = hs if ci == 0 else 1
                qt = qt_l if ci == 0 else qt_c
                dcc = dc_l if ci == 0 else dc_c
                acc = ac_l if ci == 0 else ac_c
                for by in range(f):
                    for bx in range(f):
                        y0 = (my * f + by) * 8
                        x0 = (mx * f + bx) * 8
                        preds[ci] = _encode_block(
                            c[y0:y0 + 8, x0:x0 + 8], qt, dcc, acc,
                            preds[ci], bw)
    out += bw.flush()
    out += b"\xff\xd9"                                           # EOI
    return bytes(out)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsample: bool = False) -> bytes:
    """Progressive JFIF (SOF2, Huffman, T.81 Annex G) with the scan
    script: DC all comps at Al=1 → per-component full AC band (Ss=1..63,
    Al=0) → DC refinement (Ah=1, Al=0).

    Quantized coefficients are IDENTICAL to :func:`encode_jpeg` at the
    same (quality, subsample), so ``decode_jpeg`` reconstructs the two
    streams to the same pixels bit for bit (property-tested). AC scans
    end each block with EOB0 — within the Annex K code alphabet, so the
    standard tables serve; longer EOB runs are a decoder-side feature
    (exercised by crafted-stream tests)."""
    gray, h, w, comps = _split_components(arr, subsample)
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    dc_l, ac_l = _build_codes(*HT_DC_LUMA), _build_codes(*HT_AC_LUMA)
    dc_c, ac_c = _build_codes(*HT_DC_CHROMA), _build_codes(*HT_AC_CHROMA)

    hs = 2 if (subsample and not gray) else 1
    ncomp = 1 if gray else 3
    mcu_px = 8 * hs
    mcus_y = (h + mcu_px - 1) // mcu_px
    mcus_x = (w + mcu_px - 1) // mcu_px

    # quantized zigzag coefficients per component, MCU-aligned grid
    coefs = []
    for ci, c in enumerate(comps):
        f = hs if ci == 0 else 1
        qt = qt_l if ci == 0 else qt_c
        ph, pw = mcus_y * 8 * f, mcus_x * 8 * f
        p = np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])),
                   mode="edge")
        zz = np.zeros((ph // 8, pw // 8, 64), dtype=np.int32)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                q = np.round((_DCT @ blk @ _DCT.T) / qt).astype(np.int32)
                zz[by, bx] = q.flatten()[ZIGZAG]
        coefs.append(zz)

    out = bytearray(b"\xff\xd8")
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, b"\x00" + bytes(qt_l.flatten()[ZIGZAG].tolist()))
    if not gray:
        out += _marker(0xFFDB, b"\x01" + bytes(qt_c.flatten()[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (hs << 4) | hs, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _marker(0xFFC2, sof)                                  # SOF2

    def dht(klass, ident, spec):
        bits, vals = spec
        return _marker(0xFFC4, bytes([(klass << 4) | ident])
                       + bytes(bits) + bytes(vals))
    out += dht(0, 0, HT_DC_LUMA) + dht(1, 0, HT_AC_LUMA)
    if not gray:
        out += dht(0, 1, HT_DC_CHROMA) + dht(1, 1, HT_AC_CHROMA)

    def sos_header(comp_specs, ss, se, ah, al):
        payload = bytes([len(comp_specs)])
        for cid, tdta in comp_specs:
            payload += bytes([cid, tdta])
        payload += bytes([ss, se, (ah << 4) | al])
        return _marker(0xFFDA, payload)

    # --- scan 1: DC, all components, Al=1
    specs = [(1, 0x00)] + ([] if gray else [(2, 0x11), (3, 0x11)])
    out += sos_header(specs, 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                f = hs if ci == 0 else 1
                dcc = dc_l if ci == 0 else dc_c
                for by in range(f):
                    for bx in range(f):
                        v = int(coefs[ci][my * f + by, mx * f + bx, 0]) >> 1
                        cat, bits = _magnitude(v - preds[ci])
                        preds[ci] = v
                        code, length = dcc[cat]
                        bw.write(code, length)
                        bw.write(bits, cat)
    out += bw.flush()

    # --- scans 2..: one full AC band per component, Al=0, EOB0 per block
    for ci in range(ncomp):
        f = hs if ci == 0 else 1
        acc = ac_l if ci == 0 else ac_c
        # non-interleaved grid = ceil over the component's own samples
        sx = (w * f + hs - 1) // hs
        sy = (h * f + hs - 1) // hs
        bh, bw_n = (sy + 7) // 8, (sx + 7) // 8
        out += sos_header([(ci + 1, 0x00 if ci == 0 else 0x11)], 1, 63, 0, 0)
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bw_n):
                zz = coefs[ci][by, bx]
                nz = np.nonzero(zz[1:])[0]
                last_nz = int(nz[-1]) + 1 if nz.size else 0
                run = 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = acc[0xF0]
                        bw.write(code, length)
                        run -= 16
                    cat, bits = _magnitude(v)
                    code, length = acc[(run << 4) | cat]
                    bw.write(code, length)
                    bw.write(bits, cat)
                    run = 0
                if last_nz < 63:
                    code, length = acc[0x00]         # EOB0
                    bw.write(code, length)
        out += bw.flush()

    # --- final scan: DC refinement, Ah=1, Al=0 (one bit per block)
    out += sos_header(specs, 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                f = hs if ci == 0 else 1
                for by in range(f):
                    for bx in range(f):
                        bw.write(int(coefs[ci][my * f + by,
                                               mx * f + bx, 0]) & 1, 1)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ decode


def _upsample(p: np.ndarray, factor: int, axis: int) -> np.ndarray:
    """Chroma upsample along one axis. Factor 2 uses the triangle filter
    (libjpeg's default "fancy" upsampling for centered chroma samples):
    out[2i] = (3*in[i] + in[i-1])/4, out[2i+1] = (3*in[i] + in[i+1])/4
    with edge replication — several dB better than pixel replication on
    gradient chroma. Other factors fall back to replication."""
    if factor == 1:
        return p
    if factor != 2:
        return np.repeat(p, factor, axis=axis)
    a = np.moveaxis(p, axis, 0)
    prev = np.concatenate([a[:1], a[:-1]], axis=0)
    nxt = np.concatenate([a[1:], a[-1:]], axis=0)
    out = np.empty((a.shape[0] * 2,) + a.shape[1:], dtype=np.float64)
    out[0::2] = (3.0 * a + prev) / 4.0
    out[1::2] = (3.0 * a + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _find_scan_end(blob: bytes, start: int) -> int:
    """First real marker after ``start`` (skips stuffed 0xFF00 and RSTn)."""
    i, n = start, len(blob)
    while i < n - 1:
        if blob[i] == 0xFF:
            b = blob[i + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline (SOF0/1) and progressive (SOF2, Huffman, Annex G)
    decoder; returns HxW uint8 (grayscale) or HxWx3 RGB."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    store = None          # progressive: per-comp zigzag coefficient arrays
    hier = None           # hierarchical (Annex J): {'ref': plane, 'exp': nib}
    restart_interval = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", blob[pos:pos + 2])
        seg = blob[pos + 2:pos + seglen]
        if marker == 0xDB:                     # DQT
            p = 0
            while p < len(seg):
                prec, ident = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    vals = np.array(list(seg[p:p + 64]), dtype=np.int32)
                    p += 64
                elif prec == 1:               # 16-bit entries (Pq=1)
                    vals = np.frombuffer(
                        seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    raise ValueError("invalid DQT precision")
                qts[ident] = vals[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:                   # DHT
            p = 0
            while p < len(seg):
                klass, ident = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                (dc_tabs if klass == 0 else ac_tabs)[ident] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xDE:                   # DHP — hierarchical
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if nc != 1 or prec != 8:
                raise NotImplementedError(
                    "hierarchical: 8-bit grayscale only")
            hier = {"ref": None, "exp": None}
        elif marker == 0xDF:                   # EXP — expand reference
            if hier is None:
                raise ValueError("EXP outside hierarchical stream")
            hier["exp"] = (seg[0] >> 4, seg[0] & 0x0F)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5):
            if marker == 0xC5 and hier is None:
                raise NotImplementedError(
                    "differential frame outside a hierarchical stream")
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if marker in (0xC0, 0xC2) and prec != 8:
                raise NotImplementedError("only 8-bit baseline/progressive")
            if marker == 0xC1 and prec not in (8, 12):
                raise NotImplementedError("extended sequential: 8/12-bit")
            if marker == 0xC3 and not 2 <= prec <= 16:
                raise ValueError("invalid lossless precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "prec": prec,
                     "prog": marker == 0xC2,
                     "lossless": marker == 0xC3,
                     "diff": marker == 0xC5}
        elif marker in (0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "differential progressive/lossless and arithmetic "
                "JPEG not supported")
        elif marker == 0xDD:                   # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                   # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0x0F)
            if frame.get("lossless"):
                if restart_interval:
                    raise NotImplementedError(
                        "lossless: restart intervals not supported")
                frame["ll_ss"] = seg[1 + 2 * ns]
                frame["ll_al"] = seg[3 + 2 * ns] & 0x0F
                if not 1 <= frame["ll_ss"] <= 7:
                    raise ValueError("invalid lossless predictor in SOS")
                return _decode_lossless_scan(
                    frame, sel, dc_tabs, blob[pos + seglen:])
            if hier is not None and not frame.get("prog") \
                    and not frame.get("lossless"):
                start = pos + seglen
                end = _find_scan_end(blob, start)
                if frame.get("diff"):
                    if hier["ref"] is None:
                        raise ValueError("differential frame before ref")
                    diff = _decode_scan(frame, sel, qts, dc_tabs, ac_tabs,
                                        blob[start:end], restart_interval,
                                        differential=True)
                    ref = hier["ref"]
                    if hier.get("exp"):
                        ref = _expand_ref(ref, *hier["exp"])
                        hier["exp"] = None
                    ref = ref[:frame["h"], :frame["w"]]
                    hier["ref"] = np.clip(ref + diff, 0, 255)
                else:
                    img = _decode_scan(frame, sel, qts, dc_tabs, ac_tabs,
                                       blob[start:end], restart_interval)
                    hier["ref"] = img.astype(np.int64)
                pos = end
                continue
            if not frame.get("prog"):
                data = blob[pos + seglen:]
                return _decode_scan(frame, sel, qts, dc_tabs, ac_tabs, data,
                                    restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            # spec G.1.1.1.1: DC scans have Se=0; AC scans are
            # single-component with 1 <= Ss <= Se <= 63
            if (ss == 0 and se != 0) or (ss > 0 and (ns != 1 or se < ss
                                                     or se > 63)):
                raise ValueError("invalid progressive scan band")
            if store is None:
                store = _prog_store(frame)
            start = pos + seglen
            end = _find_scan_end(blob, start)
            _decode_progressive_scan(
                frame, store, sel, dc_tabs, ac_tabs, blob[start:end],
                restart_interval, ss, se, ahal >> 4, ahal & 0x0F)
            pos = end
            continue
        pos += seglen
    if hier is not None and hier.get("ref") is not None:
        return hier["ref"].astype(np.uint8)
    if store is not None:
        return _reconstruct_progressive(frame, store, qts)
    raise ValueError("no scan found")


def _prog_store(frame) -> list[np.ndarray]:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
            for c in comps]


def _ni_grid(frame, c) -> tuple[int, int]:
    """Non-interleaved block grid (spec A.2.2): ceil over the component's
    OWN sample dimensions, not the MCU-padded plane."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    sx = (frame["w"] * c["h"] + hmax - 1) // hmax
    sy = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (sy + 7) // 8, (sx + 7) // 8


def _decode_progressive_scan(frame, store, sel, dc_tabs, ac_tabs, data,
                             ri, ss, se, ah, al):
    """One progressive scan (T.81 Annex G, Huffman): DC first/refine,
    AC first/refine with EOB runs; restart markers reset predictors and
    the EOB run."""
    comps = frame["comps"]
    br = _BitReader(data)
    scomps = [(ci, c) for ci, c in enumerate(comps) if c["id"] in sel]
    if ss == 0:                                       # ---- DC scan
        preds = {ci: 0 for ci, _ in scomps}
        units = 0

        def dc_block(ci, c, by, bx):
            blk = store[ci][by, bx]
            if ah == 0:
                t = br.huff(dc_tabs[sel[c["id"]][0]])
                preds[ci] += _extend(br.bits(t), t)
                blk[0] = preds[ci] << al
            elif br.bits(1):
                blk[0] |= (1 << al)

        if len(scomps) > 1:                           # interleaved MCUs
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if ri and units and units % ri == 0:
                        br.skip_rst()
                        preds = {ci: 0 for ci, _ in scomps}
                    units += 1
                    for ci, c in scomps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(ci, c, my * c["v"] + by,
                                         mx * c["h"] + bx)
        else:
            ci, c = scomps[0]
            bh, bw_ = _ni_grid(frame, c)
            for by in range(bh):
                for bx in range(bw_):
                    if ri and units and units % ri == 0:
                        br.skip_rst()
                        preds = {ci: 0}
                    units += 1
                    dc_block(ci, c, by, bx)
        return

    # ---- AC scan: exactly one component (spec G.1.1.1.1)
    ci, c = scomps[0]
    ac_tab = ac_tabs[sel[c["id"]][1]]
    bh, bw_ = _ni_grid(frame, c)
    eobrun = 0
    p1 = 1 << al
    units = 0
    for by in range(bh):
        for bx in range(bw_):
            if ri and units and units % ri == 0:
                br.skip_rst()
                eobrun = 0
            units += 1
            blk = store[ci][by, bx]
            if ah == 0:                               # AC first pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16
                    else:
                        k += r
                        if k > se:
                            raise ValueError("AC index overflow")
                        blk[k] = _extend(br.bits(s), s) << al
                        k += 1
            else:                                     # AC refinement
                if eobrun:
                    eobrun -= 1
                    for k in range(ss, se + 1):
                        if blk[k] and br.bits(1) and not (blk[k] & p1):
                            blk[k] += p1 if blk[k] > 0 else -p1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            r = 64    # corrections through to se, no insert
                    else:
                        newval = p1 if br.bits(1) else -p1
                    while k <= se:
                        if blk[k]:
                            if br.bits(1) and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] > 0 else -p1
                        else:
                            if r == 0:
                                if newval:
                                    blk[k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1


def _reconstruct_progressive(frame, store, qts) -> np.ndarray:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        zz = store[ci]
        by_n, bx_n = zz.shape[0], zz.shape[1]
        qt = qts[c["tq"]]
        plane = np.zeros((by_n * 8, bx_n * 8), dtype=np.float64)
        for by in range(by_n):
            for bx in range(bx_n):
                coef = (zz[by, bx][UNZIGZAG].reshape(8, 8)
                        * qt).astype(np.float64)
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _DCT.T @ coef @ _DCT + 128.0)
        planes.append(plane)
    return _planes_to_image(planes, comps, hmax, vmax,
                            frame["h"], frame["w"])


def _decode_scan(frame, sel, qts, dc_tabs, ac_tabs, data, restart_interval,
                 differential: bool = False):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]),
                       dtype=np.float64) for c in comps]
    br = _BitReader(data)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.skip_rst()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        cat = br.huff(dc_tabs[td])
                        preds[ci] += _extend(br.bits(cat), cat)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_tabs[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break        # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        coef = (zz[UNZIGZAG].reshape(8, 8) * qt).astype(np.float64)
                        shift = (0.0 if differential
                                 else float(1 << (frame.get("prec", 8) - 1)))
                        block = _DCT.T @ coef @ _DCT + shift
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    if differential:
        if len(planes) != 1:
            raise NotImplementedError("differential: grayscale only")
        return np.round(planes[0][:h, :w]).astype(np.int64)
    return _planes_to_image(planes, comps, hmax, vmax, h, w,
                            frame.get("prec", 8))


def _planes_to_image(planes, comps, hmax, vmax, h, w,
                     prec: int = 8) -> np.ndarray:
    """Shared tail of baseline + progressive decode: chroma upsample,
    crop, color convert."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = _upsample(p, vmax // c["v"], axis=0)
        p = _upsample(p, hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        top = (1 << prec) - 1
        dtype = np.uint16 if prec > 8 else np.uint8
        return np.clip(np.round(full[0]), 0, top).astype(dtype)
    if prec != 8:
        raise NotImplementedError("12-bit DCT: grayscale only")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------- lossless (SOF3, Annex H)

# General-purpose difference-category Huffman table covering SSSS 0..16
# (the standard Annex K DC tables stop at 11, which cannot code 16-bit
# differences). Canonical lengths: categories 0-2 -> 2 bits, k -> k bits
# for 3 <= k <= 15, category 16 -> 16 bits; Kraft sum = 1 - 2^-16.
_LL_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
_LL_VALUES = list(range(17))


def _ll_predict(a: int, b: int, c: int, sel: int) -> int:
    """Predictors 1-7 per T.81 Table H.1 (a=left, b=above, c=above-left)."""
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def encode_jpeg_lossless(arr: np.ndarray, predictor: int = 4,
                         point_transform: int = 0,
                         precision: int | None = None) -> bytes:
    """Lossless sequential Huffman JPEG (T.81 Annex H, SOF3).

    ``arr``: HxW or HxWxC, uint8/uint16; ``precision`` defaults to the
    dtype width (8/16) and may be set to any 2..16 (e.g. 12-bit science
    pixels). Samples are point-transformed (>> Pt) before prediction,
    per H.1; differences are coded mod 2^16 with SSSS category 16 as
    the bitless +32768 escape. Components are 1x1-sampled and
    interleaved sample-by-sample (one MCU = one sample per component).
    """
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if precision is None:
        precision = 16 if arr.dtype == np.uint16 else 8
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if int(arr.max(initial=0)) >> precision:
        raise ValueError("samples exceed declared precision")
    pt = point_transform
    planes = [(arr[:, :, ci].astype(np.int64) >> pt) for ci in range(nc)]
    default = 1 << (precision - pt - 1)
    codes = _build_codes(_LL_BITS, _LL_VALUES)
    out = _BitWriter()
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                p = planes[ci]
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(p[0, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _ll_predict(int(p[y, x - 1]), int(p[y - 1, x]),
                                       int(p[y - 1, x - 1]), predictor)
                diff = (int(p[y, x]) - pred) & 0xFFFF
                if diff == 32768:
                    code, length = codes[16]
                    out.write(code, length)
                    continue
                sdiff = diff - 65536 if diff > 32768 else diff
                cat, bits = _magnitude(sdiff)
                code, length = codes[cat]
                out.write(code, length)
                if cat:
                    out.write(bits, cat)
    entropy = out.flush()
    head = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + struct.pack(">HHB", h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    head += _marker(0xFFC3, sof)
    head += _marker(0xFFC4, bytes([0x00]) + bytes(_LL_BITS)
                    + bytes(_LL_VALUES))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])      # Ss=predictor, Se=0, Ah:Al
    head += _marker(0xFFDA, sos)
    return bytes(head) + entropy + b"\xff\xd9"


def _decode_lossless_scan(frame, sel, dc_tabs, data) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError("lossless: only 1x1 sampling")
    order = [c for c in comps if c["id"] in sel]
    if len(order) != len(comps):
        raise NotImplementedError("lossless: single full scan only")
    predictor, pt = frame["ll_ss"], frame["ll_al"]
    prec = frame["prec"]
    default = 1 << (prec - pt - 1)
    tabs = [dc_tabs[sel[c["id"]][0]] for c in order]
    planes = [np.zeros((h, w), dtype=np.int64) for _ in order]
    r = _BitReader(data)
    for y in range(h):
        for x in range(w):
            for ci, p in enumerate(planes):
                cat = r.huff(tabs[ci])
                if cat == 16:
                    d = 32768
                else:
                    d = _extend(r.bits(cat), cat)
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(p[0, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _ll_predict(int(p[y, x - 1]), int(p[y - 1, x]),
                                       int(p[y - 1, x - 1]), predictor)
                p[y, x] = (pred + d) & 0xFFFF
    img = np.stack([p << pt for p in planes], axis=2)
    img = img & ((1 << 16) - 1)
    dtype = np.uint16 if prec > 8 else np.uint8
    if img.shape[2] == 1:
        img = img[:, :, 0]
    return img.astype(dtype)


# ---------------------------------- 12-bit extended sequential (SOF1)

# Extended-range Huffman tables: the Annex K defaults stop at DC
# category 11 / AC size 10, too small for 12-bit coefficients (DC diff
# to +-32767 -> SSSS 15; AC to +-16383 -> SSSS 14). Canonical flat
# assignments, valid by Kraft: 16 DC symbols at 5 bits; 226 AC symbols
# (EOB, ZRL, run 0-15 x size 1-14) at 9 bits.
_DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC12_VALUES = list(range(16))
_AC12_VALUES = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)]
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_AC12_VALUES),
              0, 0, 0, 0, 0, 0, 0]


def encode_jpeg_ext12(arr: np.ndarray, quality: int = 85) -> bytes:
    """12-bit grayscale extended sequential JPEG (T.81 SOF1).

    ``arr``: HxW uint16 with samples < 4096. Level shift 2048, 16-bit
    quantization table (Annex K luminance scaled by quality then x16
    for the wider dynamic range), extended Huffman tables above.
    """
    if arr.ndim != 2:
        raise NotImplementedError("12-bit DCT: grayscale only")
    if int(arr.max(initial=0)) >> 12:
        raise ValueError("samples exceed 12-bit range")
    h, w = arr.shape
    qt = np.clip(_quality_scale(QT_LUMA, quality) * 16, 1, 65535)
    dc_codes = _build_codes(_DC12_BITS, _DC12_VALUES)
    ac_codes = _build_codes(_AC12_BITS, _AC12_VALUES)
    out = _BitWriter()
    pred = 0
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = arr.astype(np.float64)
    padded[h:, :w] = padded[h - 1:h, :w]        # edge replicate
    padded[:, w:] = padded[:, w - 1:w]
    padded -= 2048.0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            pred = _encode_block(block, qt, dc_codes, ac_codes, pred, out)
    entropy = out.flush()
    head = bytearray(b"\xff\xd8")
    dqt = bytes([0x10]) + b"".join(
        struct.pack(">H", int(v)) for v in qt.flatten()[ZIGZAG])
    head += _marker(0xFFDB, dqt)
    sof = bytes([12]) + struct.pack(">HHB", h, w, 1) + bytes([1, 0x11, 0])
    head += _marker(0xFFC1, sof)
    head += _marker(0xFFC4, bytes([0x00]) + bytes(_DC12_BITS)
                    + bytes(_DC12_VALUES))
    head += _marker(0xFFC4, bytes([0x10]) + bytes(_AC12_BITS)
                    + bytes(_AC12_VALUES))
    head += _marker(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return bytes(head) + entropy + b"\xff\xd9"


# ------------------------------------ hierarchical (Annex J, DHP/EXP)

def _expand_ref(ref: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """Annex J.1.1.2 reference expansion: doubling with midpoint
    interpolation (x[2i] = in[i], x[2i+1] = (in[i] + in[i+1] + 1) >> 1,
    last odd sample replicated). Integer-exact."""
    out = ref.astype(np.int64)
    if eh:
        h, w = out.shape
        e = np.empty((h, 2 * w), dtype=np.int64)
        e[:, 0::2] = out
        e[:, 1:-1:2] = (out[:, :-1] + out[:, 1:] + 1) >> 1
        e[:, -1] = out[:, -1]
        out = e
    if ev:
        h, w = out.shape
        e = np.empty((2 * h, w), dtype=np.int64)
        e[0::2, :] = out
        e[1:-1:2, :] = (out[:-1, :] + out[1:, :] + 1) >> 1
        e[-1, :] = out[-1, :]
        out = e
    return out


def _seq_frame_bits(plane: np.ndarray, qt: np.ndarray, out: _BitWriter,
                    level_shift: float) -> np.ndarray:
    """Encode one grayscale sequential scan; returns the reconstruction
    (the decoder's exact float path) for differential prediction."""
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = plane.astype(np.float64)
    padded[h:, :w] = padded[h - 1:h, :w]
    padded[:, w:] = padded[:, w - 1:w]
    padded -= level_shift
    dc_codes = _build_codes(*HT_DC_LUMA)
    ac_codes = _build_codes(*HT_AC_LUMA)
    recon = np.empty_like(padded)
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            pred = _encode_block(block, qt, dc_codes, ac_codes, pred, out)
            q = np.round((_DCT @ block @ _DCT.T) / qt)
            recon[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                _DCT.T @ (q * qt) @ _DCT)
    return recon[:h, :w] + level_shift


def encode_jpeg_hierarchical(arr: np.ndarray, quality: int = 85) -> bytes:
    """Two-level hierarchical JPEG (T.81 Annex J): DHP, a half-resolution
    SOF0 base frame, EXP(1,1), and a full-resolution DIFFERENTIAL SOF5
    frame coding (image - expanded base reconstruction) with no level
    shift. Grayscale 8-bit; the differential quant table is floored at 2
    so coefficient categories stay inside the Annex K table ranges.
    """
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise NotImplementedError("hierarchical: 8-bit grayscale only")
    h, w = arr.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    # encoder-side downsample (filter choice is the encoder's, spec J.1):
    # 2x2 mean over an edge-replicated even grid
    pad = np.empty((h2 * 2, w2 * 2), dtype=np.int64)
    pad[:h, :w] = arr
    pad[h:, :w] = pad[h - 1:h, :w]
    pad[:, w:] = pad[:, w - 1:w]
    half = ((pad[0::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 0::2]
             + pad[1::2, 1::2] + 2) // 4).astype(np.uint8)
    qt1 = _quality_scale(QT_LUMA, quality)
    qt2 = np.clip(qt1, 2, 255)
    head = bytearray(b"\xff\xd8")
    head += _marker(0xFFDE, bytes([8]) + struct.pack(">HHB", h, w, 1)
                    + bytes([1, 0x11, 0]))
    head += _marker(0xFFDB, bytes([0x00]) + bytes(
        int(v) for v in qt1.flatten()[ZIGZAG]))
    head += _marker(0xFFDB, bytes([0x01]) + bytes(
        int(v) for v in qt2.flatten()[ZIGZAG]))
    head += _marker(0xFFC4, bytes([0x00]) + bytes(HT_DC_LUMA[0])
                    + bytes(HT_DC_LUMA[1]))
    head += _marker(0xFFC4, bytes([0x10]) + bytes(HT_AC_LUMA[0])
                    + bytes(HT_AC_LUMA[1]))
    # base frame (half resolution, ordinary baseline)
    head += _marker(0xFFC0, bytes([8]) + struct.pack(">HHB", h2, w2, 1)
                    + bytes([1, 0x11, 0]))
    head += _marker(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out = _BitWriter()
    recon_half = _seq_frame_bits(half, qt1, out, 128.0)
    stream = bytearray(out.flush())
    # expanded prediction exactly as the decoder computes it
    ref = np.clip(np.round(recon_half), 0, 255).astype(np.int64)
    pred_full = _expand_ref(ref, 1, 1)[:h, :w]
    diff = arr.astype(np.int64) - pred_full
    body = bytes(head) + bytes(stream)
    body += _marker(0xFFDF, bytes([0x11]))          # EXP Eh=1, Ev=1
    body += _marker(0xFFC5, bytes([8]) + struct.pack(">HHB", h, w, 1)
                    + bytes([1, 0x11, 1]))
    body += _marker(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out2 = _BitWriter()
    _seq_frame_bits(diff, qt2, out2, 0.0)
    return body + out2.flush() + b"\xff\xd9"
