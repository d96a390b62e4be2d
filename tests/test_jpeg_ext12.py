"""12-bit extended-sequential JPEG (SOF1): lossy roundtrip quality and
declared limits."""

import numpy as np
import pytest

from imagery_utils_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_ext12,
)


def _psnr(a, b, peak):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(peak * peak / mse) if mse else np.inf


def test_flat_image_near_exact():
    img = np.full((16, 16), 3000, dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_ext12(img, quality=90))
    assert out.dtype == np.uint16
    assert out.shape == img.shape
    assert np.max(np.abs(out.astype(int) - 3000)) <= 8  # DC-only, qt/16


def test_gradient_roundtrip_quality():
    y, x = np.mgrid[0:24, 0:32]
    img = (y * 64 + x * 32).astype(np.uint16)          # smooth 12-bit ramp
    out = decode_jpeg(encode_jpeg_ext12(img, quality=92))
    assert out.shape == img.shape
    assert _psnr(out, img, 4095) > 40


def test_random_texture_decodes_in_range():
    img = np.random.default_rng(3).integers(
        0, 4096, (17, 21), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_ext12(img, quality=75))
    assert out.shape == img.shape
    assert out.max() <= 4095


def test_rejects_range_and_color():
    with pytest.raises(ValueError):
        encode_jpeg_ext12(np.full((4, 4), 5000, dtype=np.uint16))
    with pytest.raises(NotImplementedError):
        encode_jpeg_ext12(np.zeros((4, 4, 3), dtype=np.uint16))


def test_sof0_12bit_still_rejected():
    # 12-bit is only legal in EXTENDED sequential; a 12-bit frame
    # relabeled SOF0 must be rejected
    blob = bytearray(encode_jpeg_ext12(np.zeros((8, 8), dtype=np.uint16)))
    i = blob.find(b"\xff\xc1")
    blob[i + 1] = 0xC0
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_8bit_path_unchanged():
    img = np.random.default_rng(5).integers(0, 256, (16, 16),
                                            dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.dtype == np.uint8
