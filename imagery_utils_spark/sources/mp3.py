"""MP3 (MPEG-1 Layer III) frame walker — container/metadata layer from
the ISO 11172-3 header spec.

Scope: the crawl-pipeline need is INDEXING audio payloads riding in
WARC records — duration/bitrate/VBR profile, frame boundaries for
chunked processing — not synthesis. This module builds and walks frame
sequences structurally:

* 32-bit frame header: 11-bit sync, version (MPEG-1), layer (III),
  protection flag (CRC-16 present when 0), 4-bit bitrate index
  (32..320 kbps table), 2-bit sample-rate index (44100/48000/32000),
  padding bit, mode/extension/copyright/original/emphasis fields;
* frame length = 144000 * kbps // samplerate + padding (the Layer III
  MPEG-1 rule) — VBR streams walk frame-by-frame;
* ID3v2 prefix skip (10-byte header + syncsafe 28-bit size);
* loud rejection of lost sync, truncated tails, and reserved
  bitrate/samplerate indices.

The MDCT/huffman audio decode itself stays a declared limit (with the
other lossy payloads) — frame payloads here are opaque bytes, which is
exactly how a 100 TB indexing pass treats them.
"""

from __future__ import annotations

import struct

__all__ = ["BITRATES_KBPS", "SAMPLERATES", "build_mp3_frame",
           "build_id3v2", "parse_mp3"]

# MPEG-1 Layer III bitrate table, indices 1..14 (0 = free, 15 = bad)
BITRATES_KBPS = [0, 32, 40, 48, 56, 64, 80, 96, 112,
                 128, 160, 192, 224, 256, 320]
# MPEG-1 sample-rate table, indices 0..2 (3 = reserved)
SAMPLERATES = [44100, 48000, 32000]


def frame_length(kbps: int, samplerate: int, padding: int) -> int:
    return 144000 * kbps // samplerate + padding


def build_mp3_frame(bitrate_idx: int, sr_idx: int, padding: int,
                    crc: bool = False, fill: int = 0xA5) -> bytes:
    """One structurally-valid frame with opaque payload bytes."""
    if not 1 <= bitrate_idx <= 14 or not 0 <= sr_idx <= 2:
        raise ValueError("reserved bitrate/samplerate index")
    hdr = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) \
        | ((0 if crc else 1) << 16) | (bitrate_idx << 12) \
        | (sr_idx << 10) | ((padding & 1) << 9)
    n = frame_length(BITRATES_KBPS[bitrate_idx], SAMPLERATES[sr_idx],
                     padding)
    body = bytearray(struct.pack(">I", hdr))
    if crc:
        body += b"\x00\x00"          # CRC-16 slot (opaque here)
    body += bytes([fill]) * (n - len(body))
    return bytes(body)


def build_id3v2(pad: int) -> bytes:
    """Minimal ID3v2.3 tag: 10-byte header + ``pad`` filler bytes,
    size in syncsafe (7-bit groups) encoding."""
    size = bytes([(pad >> 21) & 0x7F, (pad >> 14) & 0x7F,
                  (pad >> 7) & 0x7F, pad & 0x7F])
    return b"ID3\x03\x00\x00" + size + b"\x00" * pad


def parse_mp3(data: bytes) -> list[dict]:
    """Walk every frame; -> [{offset, kbps, samplerate, padding, crc,
    length}]. Raises on lost sync or a truncated final frame."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    frames = []
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated frame header")
        (hdr,) = struct.unpack_from(">I", data, pos)
        if (hdr >> 21) != 0x7FF:
            raise ValueError(f"lost sync at offset {pos}")
        version = (hdr >> 19) & 0b11
        layer = (hdr >> 17) & 0b11
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError("MPEG-1 Layer III only")
        crc = ((hdr >> 16) & 1) == 0
        bi = (hdr >> 12) & 0xF
        si = (hdr >> 10) & 0b11
        if bi in (0, 15) or si == 3:
            raise ValueError("reserved bitrate/samplerate index")
        pad = (hdr >> 9) & 1
        n = frame_length(BITRATES_KBPS[bi], SAMPLERATES[si], pad)
        if pos + n > len(data):
            raise ValueError("truncated final frame")
        frames.append({"offset": pos, "kbps": BITRATES_KBPS[bi],
                       "samplerate": SAMPLERATES[si], "padding": pad,
                       "crc": crc, "length": n})
        pos += n
    return frames
