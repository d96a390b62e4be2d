"""ZIP container: roundtrip, crc enforcement, and BOTH-direction
interop with stdlib zipfile (ours->stdlib and stdlib->ours)."""

import io
import zipfile

import pytest

from imagery_utils_spark.sources.ziparc import (
    DEFLATED, STORED, iter_zip, write_zip)


def test_roundtrip_mixed_methods():
    entries = [("a.txt", b"hello world", STORED),
               ("dir/b.bin", bytes(range(256)) * 40, DEFLATED),
               ("empty", b"", STORED),
               ("empty.z", b"", DEFLATED)]
    blob = write_zip(entries)
    out = list(iter_zip(blob))
    assert [(e["name"], e["data"], e["method"]) for e in out] == entries
    assert out[1]["csize"] < out[1]["usize"]  # deflate actually shrank


def test_utf8_names_flagged():
    blob = write_zip([("påge/ü.txt", b"x", STORED)])
    (e,) = iter_zip(blob)
    assert e["name"] == "påge/ü.txt"


def test_crc_corruption_detected():
    blob = bytearray(write_zip([("a", b"AAAA_BBBB_CCCC", STORED)]))
    i = blob.find(b"AAAA_BBBB_CCCC")
    blob[i] ^= 0xFF
    with pytest.raises(ValueError, match="crc mismatch"):
        list(iter_zip(bytes(blob)))


def test_stdlib_reads_ours():
    entries = [("x/y.txt", b"payload one", DEFLATED),
               ("z.dat", b"\x00\x01\x02" * 100, STORED)]
    zf = zipfile.ZipFile(io.BytesIO(write_zip(entries)))
    assert zf.testzip() is None
    assert zf.namelist() == ["x/y.txt", "z.dat"]
    for name, data, _ in entries:
        assert zf.read(name) == data
    infos = zf.infolist()
    assert infos[0].compress_type == zipfile.ZIP_DEFLATED
    assert infos[1].compress_type == zipfile.ZIP_STORED


def test_ours_reads_stdlib():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("s.txt", b"stored body",
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("d.txt", b"deflate body " * 50,
                    compress_type=zipfile.ZIP_DEFLATED)
    out = {e["name"]: e for e in iter_zip(buf.getvalue())}
    assert out["s.txt"]["data"] == b"stored body"
    assert out["d.txt"]["data"] == b"deflate body " * 50


def test_comment_tail_still_finds_eocd():
    blob = write_zip([("a", b"x", STORED)])
    # a trailing comment shifts EOCD away from the tail; the scan-back
    # must still find the true record (stdlib writers do this)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a", "x")
        zf.comment = b"trailing comment bytes"
    out = list(iter_zip(buf.getvalue()))
    assert out[0]["data"] == b"x"
    assert list(iter_zip(blob))[0]["data"] == b"x"


def test_determinism():
    entries = [("n", b"same bytes", DEFLATED)]
    assert write_zip(entries) == write_zip(entries)


from hypothesis import given, settings
from hypothesis import strategies as st

_name = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"),
                           blacklist_characters="\\"),
    min_size=1, max_size=40)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(_name, st.binary(max_size=400),
                          st.sampled_from([0, 8])),
                min_size=1, max_size=6))
def test_zip_roundtrip_property(entries):
    # unique names (archives allow dupes; the test map doesn't)
    seen, uniq = set(), []
    for n, d, m in entries:
        if n not in seen:
            seen.add(n)
            uniq.append((n, d, m))
    blob = write_zip(uniq)
    out = list(iter_zip(blob))
    assert [(e["name"], e["data"], e["method"]) for e in out] == uniq
    # stdlib agrees on every payload
    import io
    import zipfile as zf
    z = zf.ZipFile(io.BytesIO(blob))
    assert z.testzip() is None
    for n, d, _ in uniq:
        assert z.read(n) == d


# ----------------------------------------------------------------- ZIP64

def test_zip64_roundtrip_forced():
    entries = [(f"d/{i}.txt", f"payload {i}".encode() * (i + 1),
                DEFLATED if i % 2 else STORED) for i in range(7)]
    blob = write_zip(entries, force_zip64=True)
    got = list(iter_zip(blob))
    assert [(e["name"], e["data"]) for e in got] == \
        [(n, d) for n, d, _ in entries]


def test_zip64_stdlib_reads_ours():
    import io
    import zipfile

    entries = [("a.txt", b"alpha" * 100, STORED),
               ("b.txt", b"beta" * 999, DEFLATED)]
    blob = write_zip(entries, force_zip64=True)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.namelist() == ["a.txt", "b.txt"]
        assert zf.read("a.txt") == b"alpha" * 100
        assert zf.read("b.txt") == b"beta" * 999
        assert zf.testzip() is None


def test_zip64_ours_reads_stdlib_forced():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        with zf.open("x.bin", "w", force_zip64=True) as f:
            f.write(b"\x01\x02" * 4096)
        zf.writestr("y.txt", "hello zip64")
    got = {e["name"]: e["data"] for e in iter_zip(buf.getvalue())}
    assert got["x.bin"] == b"\x01\x02" * 4096
    assert got["y.txt"] == b"hello zip64"


def test_zip64_many_entries_16bit_count_overflow():
    """>65535 entries forces the ZIP64 EOCD count path for real."""
    import io
    import zipfile

    n = 65540
    entries = [(f"e{i}", b"x", STORED) for i in range(n)]
    blob = write_zip(entries)  # auto-switches: n >= 0xFFFF
    got = list(iter_zip(blob))
    assert len(got) == n
    assert got[0]["name"] == "e0" and got[-1]["name"] == f"e{n - 1}"
    # stdlib agrees on the count
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert len(zf.infolist()) == n


def test_zip64_auto_stays_classic_when_small():
    """Small archives must NOT pay the ZIP64 tax (no PK\\x06\\x06)."""
    blob = write_zip([("a", b"b", STORED)])
    assert b"PK\x06\x06" not in blob
    assert list(iter_zip(blob))[0]["data"] == b"b"
