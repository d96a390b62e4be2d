"""ZIP archive container from the PKWARE APPNOTE spec — writer and
central-directory parser, no stdlib ``zipfile`` in the data path.

Web corpora ship as archives; next to WARC (sources/warc.py) the other
container a crawl pipeline meets everywhere is ZIP. This module builds
and reads the format from first principles:

* writer: one local file header (PK\\x03\\x04) + payload per entry,
  then the central directory (PK\\x01\\x02 records) and the end-of-
  central-directory record (PK\\x05\\x06). Methods: 0 = stored,
  8 = deflate (raw streams via stdlib zlib, level 6 — same
  deterministic dependency the GeoTIFF deflate strips already use).
  Timestamps are pinned to a fixed DOS date so identical inputs give
  byte-identical archives (resume/idempotence at scale). Names are
  ASCII or flagged UTF-8 (general-purpose bit 11), per APPNOTE D.1.
* parser: locate EOCD by scanning back over a possible comment, walk
  the central directory (the authoritative index — entries appended
  after a stale EOCD are ignored exactly like real tooling), seek each
  local header, inflate, and VERIFY crc32 + sizes — a corrupt payload
  raises instead of passing through.

ZIP64 (APPNOTE §4.5) is supported end-to-end: the writer switches to
the extended form when any size/offset crosses 0xFFFFFFFF, the entry
count crosses 0xFFFF, or ``force_zip64`` is set (version-needed 45,
0x0001 extra fields carrying the 64-bit sizes/offset, ZIP64 EOCD
record PK\\x06\\x06 + locator PK\\x06\\x07, sentinel-filled classic
EOCD); the parser follows the sentinels back through the locator and
reads per-entry 64-bit fields from the 0x0001 extra block in spec
order. Declared limits: no encryption,
no spanned archives. At cluster scale one executor handles one archive
blob per Arrow row (``zip_entries``), mirroring the WARC reader; large
archives should be split upstream into per-shard zips.

Reference kinship: the reference ships sidecar bundles as tar/zip
(lib/utils.py tar handling); this is the read/write path for the zip
half, Spark-native.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_zip", "iter_zip", "zip_entries", "ZIP_ENTRY_SCHEMA"]

STORED, DEFLATED = 0, 8
# fixed DOS timestamp: 2026-01-01 00:00:00 (determinism contract)
_DOS_DATE = ((2026 - 1980) << 9) | (1 << 5) | 1
_DOS_TIME = 0


def _encode_name(name: str) -> tuple[bytes, int]:
    """cp437-safe names stay unflagged; anything else is UTF-8 with the
    language-encoding flag (APPNOTE bit 11)."""
    try:
        return name.encode("ascii"), 0
    except UnicodeEncodeError:
        return name.encode("utf-8"), 1 << 11


_FFFF = 0xFFFF
_FFFFFFFF = 0xFFFFFFFF


def write_zip(entries: list[tuple[str, bytes, int]],
              force_zip64: bool = False) -> bytes:
    """Build a ZIP archive. ``entries`` = (name, payload, method) with
    method STORED (0) or DEFLATED (8). ZIP64 form (APPNOTE §4.5) is
    emitted automatically when a size/offset/count overflows the
    classic fields, or always with ``force_zip64``."""
    out = bytearray()
    central = bytearray()
    any64 = False
    for name, data, method in entries:
        if method not in (STORED, DEFLATED):
            raise ValueError(f"unsupported method {method}")
        nm, flags = _encode_name(name)
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == DEFLATED:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(data) + c.flush()
        else:
            payload = data
        offset = len(out)
        need64 = (force_zip64 or len(payload) >= _FFFFFFFF
                  or len(data) >= _FFFFFFFF or offset >= _FFFFFFFF)
        any64 = any64 or need64
        if need64:
            ver = 45
            l_extra = struct.pack("<HHQQ", 1, 16, len(data), len(payload))
            lfh = struct.pack(
                "<IHHHHHIII", 0x04034B50, ver, flags, method,
                _DOS_TIME, _DOS_DATE, crc, _FFFFFFFF, _FFFFFFFF)
            out += lfh + struct.pack("<HH", len(nm), len(l_extra))
            out += nm + l_extra + payload
            # CD extra carries (usize, csize, offset) in spec order
            c_extra = struct.pack("<HHQQQ", 1, 24, len(data),
                                  len(payload), offset)
            central += struct.pack(
                "<IHHHHHHIIIHHHHHII", 0x02014B50, 45, ver, flags, method,
                _DOS_TIME, _DOS_DATE, crc, _FFFFFFFF, _FFFFFFFF,
                len(nm), len(c_extra), 0, 0, 0, 0, _FFFFFFFF)
            central += nm + c_extra
        else:
            lfh = struct.pack(
                "<IHHHHHIII", 0x04034B50, 20, flags, method,
                _DOS_TIME, _DOS_DATE, crc, len(payload), len(data))
            out += lfh + struct.pack("<HH", len(nm), 0) + nm + payload
            central += struct.pack(
                "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, flags, method,
                _DOS_TIME, _DOS_DATE, crc, len(payload), len(data),
                len(nm), 0, 0, 0, 0, 0, offset) + nm
    cd_off = len(out)
    out += central
    n = len(entries)
    zip64 = (any64 or force_zip64 or n >= _FFFF
             or cd_off >= _FFFFFFFF or len(central) >= _FFFFFFFF)
    if zip64:
        z64_off = len(out)
        # ZIP64 EOCD record: size-of-remainder = 44
        out += struct.pack("<IQHHIIQQQQ", 0x06064B50, 44, 45, 45,
                           0, 0, n, n, len(central), cd_off)
        # ZIP64 EOCD locator
        out += struct.pack("<IIQI", 0x07064B50, 0, z64_off, 1)
        # classic EOCD in full sentinel form (readers follow the locator)
        out += struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, _FFFF, _FFFF,
                           _FFFFFFFF, _FFFFFFFF, 0)
    else:
        out += struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, n, n,
                           len(central), cd_off, 0)
    return bytes(out)


def _find_eocd(blob: bytes) -> int:
    """EOCD offset; the record is at the tail modulo a <64 KiB comment."""
    lo = max(0, len(blob) - 65557)
    i = blob.rfind(b"PK\x05\x06", lo)
    if i < 0:
        raise ValueError("not a ZIP archive (no EOCD)")
    return i


def _zip64_extra(extra: bytes, usize: int, csize: int, lfh_off: int):
    """Resolve sentinel fields from the 0x0001 extra block — values
    appear in spec order, ONLY for the fields that read 0xFFFFFFFF."""
    pos = 0
    while pos + 4 <= len(extra):
        hid, hsize = struct.unpack_from("<HH", extra, pos)
        body = extra[pos + 4:pos + 4 + hsize]
        pos += 4 + hsize
        if hid != 0x0001:
            continue
        off = 0
        if usize == _FFFFFFFF:
            usize, = struct.unpack_from("<Q", body, off)
            off += 8
        if csize == _FFFFFFFF:
            csize, = struct.unpack_from("<Q", body, off)
            off += 8
        if lfh_off == _FFFFFFFF:
            lfh_off, = struct.unpack_from("<Q", body, off)
            off += 8
        break
    return usize, csize, lfh_off


def iter_zip(blob: bytes) -> Iterator[dict]:
    """Yield {name, method, crc, usize, csize, data} per central-
    directory entry, crc/size-verified. ZIP64 archives are detected via
    the sentinel EOCD + PK\\x06\\x07 locator chain."""
    eocd = _find_eocd(blob)
    # sig(4) disk(2) cd_disk(2) n_disk(2) n_total(2) cd_size(4) cd_off(4)
    n_entries, = struct.unpack_from("<H", blob, eocd + 10)
    _cd_size, cd_off = struct.unpack_from("<II", blob, eocd + 12)
    if (n_entries == _FFFF or cd_off == _FFFFFFFF
            or _cd_size == _FFFFFFFF):
        loc = eocd - 20
        if loc < 0 or blob[loc:loc + 4] != b"PK\x06\x07":
            raise ValueError("ZIP64 sentinel EOCD without locator")
        z64_off, = struct.unpack_from("<Q", blob, loc + 8)
        if blob[z64_off:z64_off + 4] != b"PK\x06\x06":
            raise ValueError("bad ZIP64 EOCD signature")
        n_entries, = struct.unpack_from("<Q", blob, z64_off + 32)
        cd_off, = struct.unpack_from("<Q", blob, z64_off + 48)
    pos = cd_off
    for _ in range(n_entries):
        (sig, _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
         nlen, elen, clen, _disk, _iattr, _eattr,
         lfh_off) = struct.unpack_from("<IHHHHHHIIIHHHHHII", blob, pos)
        if sig != 0x02014B50:
            raise ValueError("bad central directory signature")
        raw_name = blob[pos + 46:pos + 46 + nlen]
        name = raw_name.decode("utf-8" if flags & (1 << 11) else "cp437")
        if _FFFFFFFF in (usize, csize, lfh_off):
            extra = blob[pos + 46 + nlen:pos + 46 + nlen + elen]
            usize, csize, lfh_off = _zip64_extra(extra, usize, csize,
                                                 lfh_off)
        pos += 46 + nlen + elen + clen
        # local header: re-read lengths (extra field may differ from CD)
        (lsig, _lv, _lf, lmethod, _lt, _ld, _lcrc, _lcs, _lus, lnlen,
         lelen) = struct.unpack_from("<IHHHHHIIIHH", blob, lfh_off)
        if lsig != 0x04034B50:
            raise ValueError("bad local header signature")
        if lmethod != method:
            raise ValueError("method mismatch local vs central")
        start = lfh_off + 30 + lnlen + lelen
        payload = blob[start:start + csize]
        if method == STORED:
            data = payload
        elif method == DEFLATED:
            data = zlib.decompress(payload, -15)
        else:
            raise ValueError(f"unsupported method {method}")
        if len(data) != usize:
            raise ValueError(f"{name}: size mismatch")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"{name}: crc mismatch")
        yield {"name": name, "method": method, "crc": crc,
               "usize": usize, "csize": csize, "data": data}


ZIP_ENTRY_SCHEMA = T.StructType([
    T.StructField("zip_id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("method", T.IntegerType()),
    T.StructField("usize", T.LongType()),
    T.StructField("body", T.BinaryType()),
])


def zip_entries(df: DataFrame, blob_col: str = "zip",
                id_col: str = "zip_id") -> DataFrame:
    """Explode ZIP blobs into entries (Arrow-batched, partition-
    preserving — the WARC-reader shape)."""
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for zid, blob in zip(pdf[id_col], pdf[blob_col]):
                for e in iter_zip(bytes(blob)):
                    rows.append((int(zid), e["name"], e["method"],
                                 e["usize"], e["data"]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              ZIP_ENTRY_SCHEMA.fields])

    return (df.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(run, schema=ZIP_ENTRY_SCHEMA))
