"""WARC container (sources/warc.py): roundtrip, gzip-member splitting,
non-response records, Spark explode."""
import zlib

import pytest

from imagery_utils_spark.sources.warc import (
    build_response_record, iter_warc, warc_records, write_warc)


def _recs():
    return [
        build_response_record("https://a.example/1",
                              "2026-01-01T00:00:00Z", b"hello world"),
        build_response_record("https://b.example/2",
                              "2026-01-02T00:00:00Z", b"\x00binary\xff body",
                              status=404, content_type="text/plain"),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    blob = write_warc(_recs(), gzip_members=gz)
    if gz:
        assert blob[:2] == b"\x1f\x8b"
    got = list(iter_warc(blob))
    assert [r["url"] for r in got] == ["https://a.example/1",
                                      "https://b.example/2"]
    assert got[0]["body"] == b"hello world"
    assert got[1]["body"] == b"\x00binary\xff body"
    assert got[1]["status"] == 404
    assert got[1]["content_type"] == "text/plain"
    assert got[0]["date"] == "2026-01-01T00:00:00Z"


def test_gzip_member_resync_boundary():
    # each record is its OWN member: decoding member-by-member recovers
    # record boundaries without any record-level framing state
    blob = write_warc(_recs(), gzip_members=True)
    do = zlib.decompressobj(16 + zlib.MAX_WBITS)
    first = do.decompress(blob)
    assert first.startswith(b"WARC/1.0\r\n")
    assert do.unused_data[:2] == b"\x1f\x8b"   # next member starts clean


def test_non_response_records_skipped_in_spark(spark):
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nxxxx\r\n\r\n")
    blob = write_warc([info] + _recs(), gzip_members=True)
    recs = list(iter_warc(blob))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response",
                                              "response"]
    df = spark.createDataFrame([(7, bytearray(blob))],
                               "warc_id long, warc binary")
    rows = warc_records(df).collect()
    assert len(rows) == 2
    assert {r.url for r in rows} == {"https://a.example/1",
                                     "https://b.example/2"}
    assert all(r.warc_id == 7 for r in rows)
    assert bytes(rows[0].body) == b"hello world"
