"""WARC (Web ARChive, ISO 28500 / WARC/1.0) container — the ingestion
format of real web crawls (Common Crawl ships exactly this shape:
per-record gzip members concatenated into .warc.gz files).

Writer + parser are pure stdlib (struct-free text framing, ``zlib`` for
the gzip members), built FROM THE SPEC:

* record  = ``WARC/1.0\\r\\n`` + named headers + ``\\r\\n`` +
  Content-Length payload + ``\\r\\n\\r\\n``;
* response records carry an HTTP/1.1 message (status line, headers,
  blank line, body) as their payload;
* a ``.warc.gz`` stream is one gzip MEMBER per record, concatenated —
  the member boundary is what lets a 100-TB crawl be split: any byte
  range can resync on the next gzip magic without reading the file head
  (exactly how Common Crawl's index points into its archives).

Spark surface: :func:`warc_records` explodes a binary WARC-blob column
into one row per response record via Arrow-batched ``mapInPandas`` —
partition-preserving (no shuffle), records never leave the executor
that read the blob.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["build_response_record", "write_warc", "iter_warc",
           "warc_records"]

_CRLF = b"\r\n"


def build_response_record(url: str, date: str, body: bytes,
                          status: int = 200,
                          content_type: str = "text/html") -> bytes:
    """One WARC/1.0 response record (uncompressed)."""
    http = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           + f"WARC-Target-URI: {url}\r\n".encode()
           + f"WARC-Date: {date}\r\n".encode()
           + b"Content-Type: application/http;msgtype=response\r\n"
           + f"Content-Length: {len(http)}\r\n".encode()
           + _CRLF)
    return hdr + http + _CRLF + _CRLF


def write_warc(records: list[bytes], gzip_members: bool = True) -> bytes:
    """Concatenate records; ``gzip_members=True`` wraps EACH record in
    its own gzip member (the splittable .warc.gz layout)."""
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out += co.compress(rec) + co.flush()
    return bytes(out)


def _split_members(blob: bytes) -> Iterator[bytes]:
    """Decode concatenated gzip members; plain bytes pass through."""
    if blob[:2] != b"\x1f\x8b":
        yield blob
        return
    rest = blob
    while rest[:2] == b"\x1f\x8b":
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        yield do.decompress(rest)
        rest = do.unused_data
    if rest:
        raise ValueError("trailing garbage after gzip members")


def iter_warc(blob: bytes) -> Iterator[dict]:
    """Yield records as dicts: warc_type, url, date, status,
    content_type, body (bytes). Non-response records yield with
    ``status=None, body=payload``."""
    for chunk in _split_members(blob):
        pos = 0
        n = len(chunk)
        while pos < n:
            if chunk[pos:pos + 5] != b"WARC/":
                raise ValueError(f"bad WARC version at offset {pos}")
            hdr_end = chunk.index(b"\r\n\r\n", pos)
            headers = {}
            for line in chunk[pos:hdr_end].split(_CRLF)[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode()] = v.strip().decode()
            clen = int(headers["content-length"])
            payload = chunk[hdr_end + 4:hdr_end + 4 + clen]
            pos = hdr_end + 4 + clen + 4          # trailing CRLF CRLF
            rec = {"warc_type": headers.get("warc-type", ""),
                   "url": headers.get("warc-target-uri"),
                   "date": headers.get("warc-date"),
                   "status": None, "content_type": None, "body": payload}
            if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
                he = payload.index(b"\r\n\r\n")
                lines = payload[:he].split(_CRLF)
                rec["status"] = int(lines[0].split(b" ")[1])
                for line in lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        rec["content_type"] = v.strip().decode()
                rec["body"] = payload[he + 4:]
            yield rec


WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("warc_id", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
])


def warc_records(df: DataFrame, blob_col: str = "warc",
                 id_col: str = "warc_id") -> DataFrame:
    """Explode WARC blobs into response records (Arrow-batched,
    partition-preserving; non-response records are dropped)."""
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for wid, blob in zip(pdf[id_col], pdf[blob_col]):
                for rec in iter_warc(bytes(blob)):
                    if rec["warc_type"] != "response":
                        continue
                    rows.append((int(wid), rec["url"], rec["date"],
                                 rec["status"], rec["content_type"],
                                 rec["body"]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              WARC_RECORD_SCHEMA.fields])

    return (df.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(run, schema=WARC_RECORD_SCHEMA))
