"""MP3 frame-walker tests — header packing, VBR walks, ID3 skip,
CRC flag, loud rejections."""

import struct

import pytest

from imagery_utils_spark.sources.mp3 import (
    BITRATES_KBPS, SAMPLERATES, build_id3v2, build_mp3_frame,
    frame_length, parse_mp3)


def test_header_golden_bits():
    """128 kbps, 44100 Hz, no pad, no CRC: header FF FB 90 00."""
    f = build_mp3_frame(9, 0, 0)
    assert f[:4] == b"\xff\xfb\x90\x00"
    assert len(f) == 144000 * 128 // 44100


def test_vbr_walk_every_bitrate_and_rate():
    blob = b""
    want = []
    off = 0
    for bi in range(1, 15):
        for si in range(3):
            pad = (bi + si) % 2
            fr = build_mp3_frame(bi, si, pad)
            blob += fr
            want.append((off, BITRATES_KBPS[bi], SAMPLERATES[si],
                         pad, len(fr)))
            off += len(fr)
    got = [(f["offset"], f["kbps"], f["samplerate"], f["padding"],
            f["length"]) for f in parse_mp3(blob)]
    assert got == want


def test_id3_skip_and_crc_flag():
    blob = build_id3v2(137) + build_mp3_frame(5, 1, 1, crc=True) \
        + build_mp3_frame(14, 2, 0)
    frames = parse_mp3(blob)
    assert frames[0]["offset"] == 10 + 137
    assert frames[0]["crc"] is True and frames[1]["crc"] is False
    assert frames[1]["kbps"] == 320 and frames[1]["samplerate"] == 32000


def test_rejections():
    with pytest.raises(ValueError):
        parse_mp3(b"\x00\x00\x00\x00")          # lost sync
    fr = build_mp3_frame(9, 0, 0)
    with pytest.raises(ValueError):
        parse_mp3(fr[:-5])                       # truncated tail
    bad = bytearray(fr)
    bad[2] = 0xF0                                # bitrate index 15
    with pytest.raises(ValueError):
        parse_mp3(bytes(bad))
    with pytest.raises(ValueError):
        build_mp3_frame(15, 0, 0)
    # MPEG-2 version bits refuse loudly
    hdr = struct.unpack(">I", fr[:4])[0] & ~(0b11 << 19) | (0b10 << 19)
    with pytest.raises(NotImplementedError):
        parse_mp3(struct.pack(">I", hdr) + fr[4:])


def test_frame_length_rule():
    assert frame_length(128, 44100, 0) == 417
    assert frame_length(128, 44100, 1) == 418
    assert frame_length(320, 32000, 0) == 1440
