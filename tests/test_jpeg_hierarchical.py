"""Hierarchical JPEG (T.81 Annex J): DHP/EXP/differential-frame decode,
pyramid roundtrip quality, declared limits."""

import numpy as np
import pytest

from imagery_utils_spark.sources.jpeg import (
    _expand_ref,
    decode_jpeg,
    encode_jpeg_hierarchical,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 * 255 / mse) if mse else np.inf


def test_expand_ref_exact():
    ref = np.array([[0, 10], [20, 30]], dtype=np.int64)
    e = _expand_ref(ref, 1, 1)
    assert e.shape == (4, 4)
    assert e[0, 0] == 0 and e[0, 2] == 10
    assert e[0, 1] == (0 + 10 + 1) >> 1
    assert e[1, 0] == (0 + 20 + 1) >> 1
    assert e[0, 3] == 10 and e[3, 0] == 20     # edge replication


def test_hier_roundtrip_smooth():
    y, x = np.mgrid[0:32, 0:48]
    img = ((y * 2 + x * 3) % 256).astype(np.uint8)
    blob = encode_jpeg_hierarchical(img, quality=92)
    assert b"\xff\xde" in blob and b"\xff\xdf" in blob  # DHP + EXP
    assert b"\xff\xc5" in blob                          # differential SOF5
    out = decode_jpeg(blob)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(out, img) > 35


def test_hier_roundtrip_odd_dims_and_texture():
    img = np.random.default_rng(9).integers(
        0, 256, (21, 35), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_hierarchical(img, quality=90))
    assert out.shape == img.shape
    # the differential frame must IMPROVE on the base-only pyramid:
    # compare against decoding just the base frame upscaled
    assert _psnr(out, img) > 24


def test_hier_beats_base_frame_alone():
    y, x = np.mgrid[0:24, 0:24]
    img = ((x * 7) % 256).astype(np.uint8)
    blob = encode_jpeg_hierarchical(img, quality=85)
    full = decode_jpeg(blob)
    # truncate after the first scan: keep everything up to EXP, add EOI
    cut = blob.find(b"\xff\xdf")
    base_only = decode_jpeg(blob[:cut] + b"\xff\xd9")
    up = _expand_ref(base_only.astype(np.int64), 1, 1)[:24, :24]
    assert _psnr(full, img) > _psnr(np.clip(up, 0, 255), img)


def test_differential_before_ref_rejected():
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg_hierarchical(img))
    # excise the base frame: splice DHP..first-SOS out is complex;
    # simpler: corrupt the base SOF0 marker into a comment so the first
    # scan never registers -> the differential frame hits no reference
    i = blob.find(b"\xff\xc0")
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bytes(blob[:i]) + b"\xff\xdf\x00\x03\x11"
                    + b"\xff\xc5" + bytes(blob[i + 2:]))


def test_diff_progressive_still_declared():
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg_hierarchical(img))
    i = blob.find(b"\xff\xc5")
    blob[i + 1] = 0xC6
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_nonhier_differential_rejected():
    from imagery_utils_spark.sources.jpeg import encode_jpeg
    blob = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC5
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))
