"""POSIX ustar TAR — from-spec writer and checksum-verifying parser.

The reference distributes metadata sidecars in tar bundles
(/root/reference lib utils tar handling); together with ZIP
(sources/ziparc.py) and WARC (sources/warc.py) this completes the
archive-container set a crawl pipeline meets. Format per POSIX.1-1988
ustar: 512-byte header blocks (octal numeric fields, space-blanked
checksum over the header), payload padded to 512, two zero blocks at
the end. Long names use the ustar prefix field (155+100); GNU
longlink extensions are out of scope (declared).

Determinism: mode 0644, uid/gid 0, mtime 0 — identical inputs give
byte-identical archives (idempotent re-runs / resumable writes).
Parser verifies the header checksum and the magic, skips to each next
block boundary, and stops at the first zero block; a corrupt header
raises rather than resyncing silently.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_tar", "iter_tar", "tar_entries", "TAR_ENTRY_SCHEMA"]

BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    return (f"%0{width - 1}o" % n).encode("ascii") + b"\0"


def _split_name(name: str) -> tuple[bytes, bytes]:
    nm = name.encode("utf-8")
    if len(nm) <= 100:
        return nm, b""
    # ustar prefix split at a '/' so prefix<=155 and name<=100
    cut = nm.rfind(b"/", max(0, len(nm) - 101), len(nm) - 1)
    if cut < 0 or cut > 155:
        raise ValueError(f"name too long for ustar: {name!r}")
    return nm[cut + 1:], nm[:cut]


def write_tar(entries: list[tuple[str, bytes]]) -> bytes:
    out = bytearray()
    for name, data in entries:
        nm, prefix = _split_name(name)
        hdr = bytearray(BLOCK)
        hdr[0:len(nm)] = nm
        hdr[100:108] = _octal(0o644, 8)
        hdr[108:116] = _octal(0, 8)
        hdr[116:124] = _octal(0, 8)
        hdr[124:136] = _octal(len(data), 12)
        hdr[136:148] = _octal(0, 12)
        hdr[148:156] = b" " * 8          # checksum blanked for the sum
        hdr[156] = 0x30                  # typeflag '0' regular file
        hdr[257:263] = b"ustar\0"
        hdr[263:265] = b"00"
        hdr[345:345 + len(prefix)] = prefix
        chk = sum(hdr)
        hdr[148:156] = (b"%06o" % chk) + b"\0 "
        out += hdr + data
        pad = (-len(data)) % BLOCK
        out += b"\0" * pad
    out += b"\0" * (2 * BLOCK)
    return bytes(out)


def iter_tar(blob: bytes) -> Iterator[dict]:
    pos = 0
    while pos + BLOCK <= len(blob):
        hdr = blob[pos:pos + BLOCK]
        if hdr == b"\0" * BLOCK:
            return
        stored = int(hdr[148:156].split(b"\0")[0].strip() or b"0", 8)
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        if sum(blanked) != stored:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        if hdr[257:262] != b"ustar":
            raise ValueError("not a ustar header")
        name = hdr[0:100].split(b"\0")[0].decode("utf-8")
        prefix = hdr[345:500].split(b"\0")[0].decode("utf-8")
        if prefix:
            name = prefix + "/" + name
        size = int(hdr[124:136].split(b"\0")[0].strip(), 8)
        typeflag = chr(hdr[156])
        data = blob[pos + BLOCK:pos + BLOCK + size]
        if len(data) != size:
            raise ValueError(f"{name}: truncated payload")
        pos += BLOCK + size + ((-size) % BLOCK)
        yield {"name": name, "size": size, "typeflag": typeflag,
               "data": data}
    raise ValueError("missing end-of-archive blocks")


TAR_ENTRY_SCHEMA = T.StructType([
    T.StructField("tar_id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("body", T.BinaryType()),
])


def tar_entries(df: DataFrame, blob_col: str = "tar",
                id_col: str = "tar_id") -> DataFrame:
    """Explode TAR blobs into entries (Arrow-batched, partition-
    preserving — the WARC/ZIP reader shape)."""
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for tid, blob in zip(pdf[id_col], pdf[blob_col]):
                for e in iter_tar(bytes(blob)):
                    rows.append((int(tid), e["name"], e["size"],
                                 e["data"]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              TAR_ENTRY_SCHEMA.fields])

    return (df.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(run, schema=TAR_ENTRY_SCHEMA))
