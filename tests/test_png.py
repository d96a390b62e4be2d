"""PNG codec tests — spec-structure checks, filter coverage, foreign
zlib producers, and hypothesis property roundtrips."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imagery_utils_spark.sources.png import decode_png, encode_png


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "adaptive"])
@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (8, 8),
                                   (5, 3, 3), (17, 9, 3)])
def test_roundtrip_all_filters_gray_and_rgb(ft, shape):
    img = _rand(shape, seed=hash((str(ft), shape)) % 2**31)
    out = decode_png(encode_png(img, ft))
    assert out.shape == img.shape
    assert (out == img).all()


def test_chunk_structure_and_crc():
    img = _rand((4, 4))
    b = encode_png(img)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, types = 8, []
    while pos < len(b):
        ln, typ = struct.unpack(">I4s", b[pos:pos + 8])
        body = b[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", b[pos + 8 + ln:pos + 12 + ln])[0]
        assert zlib.crc32(typ + body) & 0xFFFFFFFF == crc
        types.append(typ)
        pos += 12 + ln
    assert types[0] == b"IHDR" and types[-1] == b"IEND"
    assert b"IDAT" in types


def test_foreign_producer_stored_blocks_and_split_idat():
    """A compliant stream from another producer: stored-deflate and
    IDAT split into 1-byte chunks must decode identically."""
    img = _rand((6, 7), seed=3)
    ref = encode_png(img, 2, level=0)           # stored zlib blocks
    assert (decode_png(ref) == img).all()
    # re-frame: split the IDAT payload into single-byte IDAT chunks
    pos, head, idat, tail = 8, ref[:8], b"", b""
    chunks = []
    while pos < len(ref):
        ln, typ = struct.unpack(">I4s", ref[pos:pos + 8])
        body = ref[pos + 8:pos + 8 + ln]
        chunks.append((typ, body))
        pos += 12 + ln
    out = bytearray(head)
    for typ, body in chunks:
        if typ == b"IDAT":
            for i in range(len(body)):
                piece = body[i:i + 1]
                out += (struct.pack(">I", 1) + b"IDAT" + piece
                        + struct.pack(">I", zlib.crc32(b"IDAT" + piece)
                                      & 0xFFFFFFFF))
        else:
            out += (struct.pack(">I", len(body)) + typ + body
                    + struct.pack(">I", zlib.crc32(typ + body)
                                  & 0xFFFFFFFF))
    assert (decode_png(bytes(out)) == img).all()


def test_corruption_rejected():
    img = _rand((5, 5), seed=4)
    b = bytearray(encode_png(img))
    b[41] ^= 0x55
    with pytest.raises(ValueError):
        decode_png(bytes(b))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\x00" + bytes(b[8:]))


def test_unsupported_profile_declared():
    img = _rand((4, 4))
    b = bytearray(encode_png(img))
    # flip IHDR bit depth 8 -> 16 and fix the CRC: decoder must refuse
    # loudly, not mis-decode
    ihdr = bytearray(b[16:29])
    ihdr[8] = 16
    b[16:29] = ihdr
    crc = zlib.crc32(b"IHDR" + bytes(b[16:29])) & 0xFFFFFFFF
    b[29:33] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError):
        decode_png(bytes(b))


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12), h=st.integers(1, 12),
    rgb=st.booleans(),
    ft=st.sampled_from([0, 1, 2, 3, 4, "adaptive"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_roundtrip(w, h, rgb, ft, seed):
    shape = (h, w, 3) if rgb else (h, w)
    img = _rand(shape, seed=seed)
    out = decode_png(encode_png(img, ft))
    assert out.shape == img.shape and (out == img).all()


# ---------------------------------------------------------------- Adam7
import numpy as _np

from imagery_utils_spark.sources.png import decode_png as _dec
from imagery_utils_spark.sources.png import encode_png as _enc


def _grad(h, w, ch=None):
    y, x = _np.mgrid[0:h, 0:w]
    g = ((x * 3 + y * 7) % 256).astype(_np.uint8)
    if ch:
        return _np.stack(
            [g, (g.astype(_np.int32) + 85) % 256,
             (g.astype(_np.int32) + 170) % 256],
            axis=-1).astype(_np.uint8)
    return g


def test_adam7_roundtrip_various_sizes_gray():
    # sizes straddling every pass-emptiness boundary (1..9 plus odd)
    for h in (1, 2, 3, 4, 5, 7, 8, 9, 13):
        for w in (1, 2, 3, 4, 5, 7, 8, 9, 11):
            img = _grad(h, w)
            blob = _enc(img, interlace=1)
            out = _dec(blob)
            assert out.shape == img.shape, (h, w)
            assert (out == img).all(), (h, w)


def test_adam7_roundtrip_rgb_adaptive():
    img = _grad(23, 17, ch=3)
    out = _dec(_enc(img, interlace=1, filter_type="adaptive"))
    assert (out == img).all()


def test_adam7_equals_noninterlaced_pixels():
    img = _grad(16, 16, ch=3)
    a = _dec(_enc(img, interlace=0))
    b = _dec(_enc(img, interlace=1))
    assert (a == b).all()


def test_adam7_interlace_flag_in_ihdr():
    blob = _enc(_grad(8, 8), interlace=1)
    assert blob[8 + 8 + 12] == 1  # IHDR interlace byte
