"""BMP: roundtrip (odd widths exercise row padding), profile rejects."""

import numpy as np
import pytest

from imagery_utils_spark.sources.bmp import decode_bmp, encode_bmp


def _grad(h, w, rgb=False):
    y, x = np.mgrid[0:h, 0:w]
    g = ((x * 5 + y * 11) % 256).astype(np.uint8)
    if rgb:
        return np.stack([g, 255 - g, (g // 2)], axis=-1).astype(np.uint8)
    return g


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 17])
def test_gray_roundtrip_padding(w):
    img = _grad(7, w)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == img.shape and (out == img).all()


@pytest.mark.parametrize("w", [1, 3, 4, 13])
def test_rgb_roundtrip_padding(w):
    img = _grad(5, w, rgb=True)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == img.shape and (out == img).all()


def test_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG whatever")
    blob = bytearray(encode_bmp(_grad(4, 4)))
    blob[30:34] = (1).to_bytes(4, "little")  # compression = RLE8
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_bmp(bytes(blob))


def test_deterministic():
    img = _grad(9, 9, rgb=True)
    assert encode_bmp(img) == encode_bmp(img)
