"""EXIF metadata in JPEG APP1 — writer + parser from the public specs
(TIFF 6.0 IFD structure, EXIF 2.3 §4.5 "Exif\\0\\0" APP1 envelope,
JPEG T.81 marker grammar). The multimodal-pipeline use: a 100-TB image
corpus carries camera metadata in-band; extracting it is a pure
binary-column scan (mapInPandas over the blob column), no image decode
needed — the parser walks markers, never entropy-coded data.

Both byte orders are handled ("II" little / "MM" big — TIFF 6.0 §2).
Tag types implemented: ASCII (2), SHORT (3), LONG (4) — the types the
baseline IFD0 tags use. Values ≤4 bytes live inline in the value
field, longer values are offset-addressed, per spec.

Reference kinship: the reference parses vendor metadata sidecars for
the same attributes (lib/mosaic.py reads acquisition metadata); this
is the in-band binary equivalent, Spark-native.
"""

from __future__ import annotations

import struct

__all__ = ["build_jpeg_exif", "parse_exif", "TAG_NAMES"]

TAG_NAMES = {
    0x010F: "make", 0x0110: "model", 0x0112: "orientation",
    0x0132: "datetime", 0x0131: "software",
}
_ASCII, _SHORT, _LONG = 2, 3, 4


def _pack_ifd(fields: dict[int, object], endian: str) -> bytes:
    """One IFD0 with inline/offset values per TIFF 6.0 §2. ``endian`` is
    '<' or '>'."""
    entries = []
    heap = bytearray()
    n = len(fields)
    # header(8) + count(2) + n*12 + next(4)
    heap_base = 8 + 2 + n * 12 + 4
    for tid in sorted(fields):
        v = fields[tid]
        if isinstance(v, str):
            data = v.encode("ascii") + b"\0"
            if len(data) <= 4:
                val = data.ljust(4, b"\0")
            else:
                val = struct.pack(endian + "I", heap_base + len(heap))
                heap += data
            entries.append(struct.pack(endian + "HHI", tid, _ASCII,
                                       len(data)) + val)
        elif isinstance(v, int) and v < 0x10000:
            val = struct.pack(endian + "H", v)
            # inline SHORT occupies the first 2 bytes of the value field
            entries.append(struct.pack(endian + "HHI", tid, _SHORT, 1)
                           + val + b"\0\0")
        else:
            entries.append(struct.pack(endian + "HHI", tid, _LONG, 1)
                           + struct.pack(endian + "I", int(v)))
    body = struct.pack(endian + "H", n) + b"".join(entries) \
        + struct.pack(endian + "I", 0)
    hdr = (b"II" if endian == "<" else b"MM") \
        + struct.pack(endian + "H", 42) + struct.pack(endian + "I", 8)
    return hdr + body + bytes(heap)


def build_jpeg_exif(fields: dict[int, object],
                    little_endian: bool = True) -> bytes:
    """Minimal JPEG containing the EXIF APP1 segment: SOI + APP1
    ("Exif\\0\\0" + TIFF IFD) + EOI. Enough for any marker-walking
    reader; no entropy data (this is a metadata container fixture)."""
    tiff = _pack_ifd(fields, "<" if little_endian else ">")
    payload = b"Exif\0\0" + tiff
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("APP1 overflow")
    return (b"\xFF\xD8" + b"\xFF\xE1"
            + struct.pack(">H", len(payload) + 2) + payload + b"\xFF\xD9")


def parse_exif(blob: bytes) -> dict:
    """Walk JPEG markers to APP1/Exif, parse the TIFF IFD0, return
    {name: value} for known tags plus ``byte_order`` ('II'/'MM').
    Raises on malformed marker grammar (corrupt input must not pass)."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = blob[pos + 1]
        if marker == 0xD9:                        # EOI
            break
        seglen, = struct.unpack(">H", blob[pos + 2:pos + 4])
        seg = blob[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker != 0xE1 or not seg.startswith(b"Exif\0\0"):
            continue
        tiff = seg[6:]
        order = tiff[:2]
        if order == b"II":
            e = "<"
        elif order == b"MM":
            e = ">"
        else:
            raise ValueError("bad TIFF byte order")
        magic, = struct.unpack(e + "H", tiff[2:4])
        if magic != 42:
            raise ValueError("bad TIFF magic")
        ifd_off, = struct.unpack(e + "I", tiff[4:8])
        n, = struct.unpack(e + "H", tiff[ifd_off:ifd_off + 2])
        out: dict[str, object] = {"byte_order": order.decode()}
        p = ifd_off + 2
        for _ in range(n):
            tid, ttype, count = struct.unpack(e + "HHI", tiff[p:p + 8])
            valf = tiff[p + 8:p + 12]
            p += 12
            name = TAG_NAMES.get(tid)
            if name is None:
                continue
            if ttype == _ASCII:
                if count <= 4:
                    raw = valf[:count]
                else:
                    off, = struct.unpack(e + "I", valf)
                    raw = tiff[off:off + count]
                out[name] = raw.rstrip(b"\0").decode("ascii")
            elif ttype == _SHORT and count == 1:
                out[name], = struct.unpack(e + "H", valf[:2])
            elif ttype == _LONG and count == 1:
                out[name], = struct.unpack(e + "I", valf)
        return out
    raise ValueError("no EXIF APP1 segment")
