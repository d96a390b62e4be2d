"""Progressive JPEG (sources/jpeg.py, T.81 Annex G):

* property: progressive and baseline encodings of the same image carry
  IDENTICAL quantized coefficients, so decode must reconstruct them to
  the same pixels bit for bit;
* crafted streams: EOB runs > 1 and AC successive-approximation
  refinement (paths our encoder doesn't emit) decoded against
  coefficients worked out by hand.
"""
import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from imagery_utils_spark.sources.jpeg import (
    _DCT, HT_DC_LUMA, _BitWriter, _build_codes, _magnitude, decode_jpeg,
    encode_jpeg, encode_jpeg_progressive)


@settings(max_examples=20, deadline=None)
@given(st.integers(8, 40), st.integers(8, 40), st.integers(0, 10 ** 6),
       st.sampled_from([70, 85, 95]), st.booleans(), st.booleans())
def test_progressive_equals_baseline(w, h, seed, quality, subsample, gray):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality,
                                   subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality,
                                               subsample=subsample))
    assert np.array_equal(base, prog)


def _marker(tag, payload):
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _crafted_stream():
    """Grayscale 8x24 (3 blocks), all-ones quant table. Scans:
    1. DC first, Al=1:     dc>>1 values 2, -2, 0
    2. AC first, Al=1:     b0: zz[3]=1<<1; then EOB1+extra=1 -> skips b1,b2
    3. AC refine, Ah=1:    b0: insert zz[1]=+1, EOB0 w/ correction bit
                           raising zz[3] 2->3; EOB1 extra=0 covers b1,b2
    4. DC refine, Ah=1:    bits 1,1,0 -> dc 5, -3, 0
    Expected final zigzag coefs: b0 (5, +1, 0, 3, 0...), b1 (-3, 0...),
    b2 all zero.
    """
    out = bytearray(b"\xff\xd8")
    out += _marker(0xFFDB, b"\x00" + bytes([1] * 64))
    out += _marker(0xFFC2, struct.pack(">BHHB", 8, 8, 24, 1)
                   + bytes([1, 0x11, 0]))
    dc_bits, dc_vals = HT_DC_LUMA
    out += _marker(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    # custom AC table: len1 '0'->EOB0, len2 '10'->0x01, len3 '110'->EOB1,
    # '111'->0x21
    ac_bits = [1, 1, 2] + [0] * 13
    ac_vals = [0x00, 0x01, 0x10, 0x21]
    out += _marker(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    dc_codes = _build_codes(dc_bits, dc_vals)
    ac_codes = _build_codes(ac_bits, ac_vals)

    def sos(specs, ss, se, ah, al):
        p = bytes([len(specs)])
        for cid, tdta in specs:
            p += bytes([cid, tdta])
        return _marker(0xFFDA, p + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first (Al=1), diffs of (2, -2, 0) = 2, -4, 2
    out += sos([(1, 0x00)], 0, 0, 0, 1)
    bw = _BitWriter()
    for diff in (2, -4, 2):
        cat, bits = _magnitude(diff)
        code, length = dc_codes[cat]
        bw.write(code, length)
        bw.write(bits, cat)
    out += bw.flush()

    # scan 2: AC first Ss=1..63 Al=1
    out += sos([(1, 0x10)], 1, 63, 0, 1)
    bw = _BitWriter()
    code, length = ac_codes[0x21]       # run 2, size 1 -> zz[3]
    bw.write(code, length)
    bw.write(1, 1)                      # amplitude +1 (<<1 -> 2)
    code, length = ac_codes[0x10]       # EOB1
    bw.write(code, length)
    bw.write(1, 1)                      # extra bit -> eobrun = 2
    out += bw.flush()

    # scan 3: AC refinement Ah=1 Al=0
    out += sos([(1, 0x10)], 1, 63, 1, 0)
    bw = _BitWriter()
    code, length = ac_codes[0x01]       # insert at k=1
    bw.write(code, length)
    bw.write(1, 1)                      # sign + -> +1
    code, length = ac_codes[0x00]       # EOB0: corrections through se
    bw.write(code, length)
    bw.write(1, 1)                      # correction for zz[3]: 2 -> 3
    code, length = ac_codes[0x10]       # EOB1, extra 0 -> covers b1+b2
    bw.write(code, length)
    bw.write(0, 1)
    out += bw.flush()

    # scan 4: DC refinement Ah=1 Al=0 -> one bit per block
    out += sos([(1, 0x00)], 0, 0, 1, 0)
    bw = _BitWriter()
    for bit in (1, 1, 0):
        bw.write(bit, 1)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_crafted_eobrun_and_ac_refinement():
    from imagery_utils_spark.sources.jpeg import UNZIGZAG

    got = decode_jpeg(_crafted_stream())
    assert got.shape == (8, 24)
    expected = np.zeros((8, 24))
    for bi, zz in enumerate([
            [5, 1, 0, 3] + [0] * 60,
            [-3] + [0] * 63,
            [0] * 64]):
        coef = np.array(zz)[UNZIGZAG].reshape(8, 8).astype(np.float64)
        expected[:, bi * 8:bi * 8 + 8] = _DCT.T @ coef @ _DCT + 128.0
    expected = np.clip(np.round(expected), 0, 255).astype(np.uint8)
    assert np.array_equal(got, expected)


def test_progressive_autosniffs_in_multimodal():
    from imagery_utils_spark.sources.multimodal import _decode

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    blob = encode_jpeg_progressive(img, quality=90)
    dec = _decode(blob, "auto")
    assert dec.shape == img.shape


def test_invalid_progressive_band_rejected():
    import pytest

    img = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg_progressive(img))
    # corrupt the first SOS band spec: DC scan with Se=63
    i = blob.find(b"\xff\xda")
    (seglen,) = struct.unpack(">H", blob[i + 2:i + 4])
    ns = blob[i + 4]
    blob[i + 4 + 1 + 2 * ns + 1] = 63
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))
