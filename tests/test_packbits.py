"""PackBits: spec vectors, roundtrip fuzz, row-boundary isolation."""

import numpy as np
import pytest

from imagery_utils_spark.sources.packbits import (
    packbits_decode, packbits_encode)


def test_tiff_spec_example():
    # the worked example from TIFF 6.0 §9
    raw = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA,
                 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA,
                 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
    packed = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                    0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    assert packbits_encode(raw) == packed
    assert packbits_decode(packed, len(raw)) == raw


def test_roundtrip_fuzz():
    rng = np.random.RandomState(11)
    for trial in range(60):
        n = int(rng.randint(1, 700))
        # mix of runs and noise
        raw = bytes(rng.choice([0, 0, 0, 7, 255, int(rng.randint(256))])
                    for _ in range(n))
        packed = packbits_encode(raw)
        assert packbits_decode(packed, n) == raw, trial


def test_long_runs_and_literals():
    assert packbits_decode(packbits_encode(b"\x55" * 400), 400) == b"\x55" * 400
    lit = bytes(range(256)) * 2
    assert packbits_decode(packbits_encode(lit), len(lit)) == lit


def test_rows_pack_independently():
    # a run spanning two rows must NOT merge when row_bytes is given
    row = b"\xAA" * 8
    packed = packbits_encode(row + row, row_bytes=8)
    assert packed == packbits_encode(row) + packbits_encode(row)
    assert packbits_decode(packed, 16) == row + row


def test_truncation_detected():
    with pytest.raises(ValueError):
        packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError):
        packbits_decode(b"\xfe", 3)


def test_geotiff_packbits_strip_roundtrip():
    import numpy as np

    from imagery_utils_spark.sources.geotiff import (
        decode_geotiff, encode_geotiff)

    y, x = np.mgrid[0:33, 0:47]
    flat = ((x // 9) * 40 % 256).astype(np.uint8)  # runs -> packs well
    for arr in (flat, np.stack([flat, (flat.astype(np.int32) + 91)
                                % 256, 255 - flat],
                               axis=-1).astype(np.uint8)):
        blob = encode_geotiff(arr, -10.0, 40.0, -9.0, 41.0,
                              epsg=4326, compress="packbits")
        out, gt, epsg = decode_geotiff(blob)
        assert (out == arr).all()
        assert epsg == 4326
    # runs-heavy image must actually shrink
    runs = np.zeros((64, 64), dtype=np.uint8)
    small = encode_geotiff(runs, 0.0, 0.0, 1.0, 1.0, epsg=4326,
                           compress="packbits")
    plain = encode_geotiff(runs, 0.0, 0.0, 1.0, 1.0, epsg=4326)
    assert len(small) < len(plain) / 3
