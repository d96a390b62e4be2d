"""Lossless JPEG (T.81 Annex H, SOF3): roundtrip must be BIT-EXACT by
definition — every predictor, multi-component, high precision, point
transform, and the mod-2^16 difference wrap."""

import numpy as np
import pytest

from imagery_utils_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg_lossless,
)


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_gray8_all_predictors(predictor):
    img = _rng(predictor).integers(0, 256, (21, 17), dtype=np.uint8)
    blob = encode_jpeg_lossless(img, predictor=predictor)
    out = decode_jpeg(blob)
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_roundtrip_rgb8():
    img = _rng(1).integers(0, 256, (13, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=4))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@pytest.mark.parametrize("prec", [12, 16])
def test_roundtrip_high_precision(prec):
    img = _rng(prec).integers(0, 1 << prec, (11, 9), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(img, precision=prec))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_extreme_differences_wrap_mod_2_16():
    # alternating 0 / 65535 maximizes |diff|; exercises the SSSS=16
    # bitless +32768 escape and the mod-2^16 wrap
    img = np.zeros((4, 8), dtype=np.uint16)
    img[:, 1::2] = 65535
    img[2, :] = 32768
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=1))
    assert np.array_equal(out, img)


def test_point_transform_shifts():
    img = _rng(7).integers(0, 256, (9, 9), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(img, point_transform=2))
    assert np.array_equal(out, (img >> 2) << 2)


def test_precision_overflow_rejected():
    img = np.full((2, 2), 4096, dtype=np.uint16)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(img, precision=12)


def test_gradient_images_small_diffs():
    y, x = np.mgrid[0:16, 0:24]
    img = ((y * 3 + x * 5) % 256).astype(np.uint8)
    for pred in (1, 4, 7):
        out = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
        assert np.array_equal(out, img)


def test_hierarchical_still_rejected():
    img = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(encode_jpeg_lossless(img))
    i = blob.find(b"\xff\xc3")
    blob[i + 1] = 0xC5                      # relabel SOF3 -> SOF5
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))
