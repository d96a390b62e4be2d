"""Hypothesis property tests for the round-5 codec additions: lossless
JPEG roundtrips BIT-exactly for arbitrary images/predictors/precisions,
12-bit and hierarchical streams decode to the declared shapes/ranges."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from imagery_utils_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg_ext12,
    encode_jpeg_hierarchical,
    encode_jpeg_lossless,
)


@st.composite
def _gray(draw, max_val, dtype):
    h = draw(st.integers(1, 14))
    w = draw(st.integers(1, 14))
    seed = draw(st.integers(0, 2 ** 31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, max_val + 1, (h, w), dtype=dtype)


@settings(max_examples=40, deadline=None)
@given(img=_gray(255, np.uint8), pred=st.integers(1, 7))
def test_lossless8_roundtrip_bitexact(img, pred):
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=pred))
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(img=_gray(65535, np.uint16), pred=st.integers(1, 7),
       pt=st.integers(0, 3))
def test_lossless16_roundtrip_bitexact(img, pred, pt):
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=pred,
                                           point_transform=pt))
    assert np.array_equal(out, (img >> pt).astype(np.uint32) << pt)


@settings(max_examples=20, deadline=None)
@given(img=_gray(4095, np.uint16), pred=st.integers(1, 7))
def test_lossless12_roundtrip_bitexact(img, pred):
    out = decode_jpeg(encode_jpeg_lossless(img, predictor=pred,
                                           precision=12))
    assert np.array_equal(out, img)


@settings(max_examples=15, deadline=None)
@given(img=_gray(4095, np.uint16), q=st.integers(50, 95))
def test_ext12_decodes_shape_and_range(img, q):
    out = decode_jpeg(encode_jpeg_ext12(img, quality=q))
    assert out.shape == img.shape
    assert out.dtype == np.uint16
    assert int(out.max(initial=0)) <= 4095


@settings(max_examples=15, deadline=None)
@given(img=_gray(255, np.uint8), q=st.integers(60, 95))
def test_hierarchical_decodes_shape_and_range(img, q):
    out = decode_jpeg(encode_jpeg_hierarchical(img, quality=q))
    assert out.shape == img.shape
    assert out.dtype == np.uint8
