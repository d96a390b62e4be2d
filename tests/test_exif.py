"""EXIF APP1 writer/parser (sources/exif.py) vs a hand-assembled
spec-layout golden blob and both-byte-order roundtrips."""

import struct

import pytest

from imagery_utils_spark.sources.exif import (
    build_jpeg_exif, parse_exif)


def test_roundtrip_little_endian():
    got = parse_exif(build_jpeg_exif(
        {0x010F: "VendorA", 0x0110: "CamX", 0x0112: 6,
         0x0132: "2026:01:05 00:00:00"}, little_endian=True))
    assert got == {"byte_order": "II", "make": "VendorA",
                   "model": "CamX", "orientation": 6,
                   "datetime": "2026:01:05 00:00:00"}


def test_roundtrip_big_endian():
    got = parse_exif(build_jpeg_exif(
        {0x010F: "V", 0x0112: 1}, little_endian=False))
    assert got == {"byte_order": "MM", "make": "V", "orientation": 1}


def test_golden_hand_assembled_blob():
    """TIFF 6.0 worked layout, assembled field-by-field by hand (NOT via
    the writer): II header, one IFD, Orientation=3 inline SHORT and
    Make='Kodak' via heap offset."""
    make = b"Kodak\0"
    # header 8 + count 2 + 2*12 + next 4 = 38 -> heap at 38
    tiff = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 2)
            + struct.pack("<HHI", 0x010F, 2, len(make))
            + struct.pack("<I", 38)
            + struct.pack("<HHI", 0x0112, 3, 1) + b"\x03\x00\x00\x00"
            + struct.pack("<I", 0)
            + make)
    payload = b"Exif\0\0" + tiff
    blob = (b"\xFF\xD8\xFF\xE1" + struct.pack(">H", len(payload) + 2)
            + payload + b"\xFF\xD9")
    got = parse_exif(blob)
    assert got == {"byte_order": "II", "make": "Kodak", "orientation": 3}


def test_skips_leading_non_exif_segments():
    inner = build_jpeg_exif({0x0110: "M"})
    # splice an APP0/JFIF segment between SOI and APP1
    jfif = b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\0" + b"\0" * 9
    blob = inner[:2] + jfif + inner[2:]
    assert parse_exif(blob)["model"] == "M"


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_exif(b"\x00\x00")
    with pytest.raises(ValueError):
        parse_exif(b"\xFF\xD8\xFF\xD9")  # no APP1
    bad = bytearray(build_jpeg_exif({0x0110: "M"}))
    bad[6:8] = b"XX"  # clobber byte order ('II' at offset 6 after Exif hdr)
    # offset: SOI(2)+APP1 marker(2)+len(2)+'Exif\0\0'(6) = 12
    bad = bytearray(build_jpeg_exif({0x0110: "M"}))
    bad[12:14] = b"XX"
    with pytest.raises(ValueError):
        parse_exif(bytes(bad))
