"""ustar TAR: roundtrip, checksum enforcement, long-name prefix split,
stdlib tarfile interop in both directions."""

import io
import tarfile

import pytest

from imagery_utils_spark.sources.tar import iter_tar, write_tar


ENTRIES = [("a.txt", b"hello"), ("dir/b.bin", bytes(range(256))),
           ("empty", b""), ("pad511", b"x" * 511), ("pad512", b"y" * 512)]


def test_roundtrip():
    out = list(iter_tar(write_tar(ENTRIES)))
    assert [(e["name"], e["data"]) for e in out] == ENTRIES
    assert all(e["typeflag"] == "0" for e in out)


def test_long_name_prefix_split_roundtrip():
    name = "deep/" * 30 + "leaf.txt"  # >100 chars, splittable at '/'
    assert len(name) > 100
    (e,) = iter_tar(write_tar([(name, b"z")]))
    assert e["name"] == name and e["data"] == b"z"


def test_checksum_corruption_detected():
    blob = bytearray(write_tar([("a", b"data")]))
    blob[0] ^= 0x01  # flip a name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        list(iter_tar(bytes(blob)))


def test_missing_terminator_detected():
    blob = write_tar([("a", b"data")])
    with pytest.raises(ValueError, match="end-of-archive"):
        list(iter_tar(blob[:-1024]))


def test_stdlib_reads_ours():
    tf = tarfile.open(fileobj=io.BytesIO(write_tar(ENTRIES)))
    assert tf.getnames() == [n for n, _ in ENTRIES]
    for name, data in ENTRIES:
        assert tf.extractfile(name).read() == data


def test_ours_reads_stdlib():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in ENTRIES:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    out = {e["name"]: e["data"] for e in iter_tar(buf.getvalue())}
    assert out == dict(ENTRIES)


def test_determinism():
    assert write_tar(ENTRIES) == write_tar(ENTRIES)


from hypothesis import given, settings
from hypothesis import strategies as st

_tname = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-/",
                 min_size=1, max_size=90).filter(
    lambda s: not s.startswith("/") and "//" not in s
    and not s.endswith("/"))


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(_tname, st.binary(max_size=600)),
                min_size=1, max_size=5))
def test_tar_roundtrip_property(entries):
    seen, uniq = set(), []
    for n, d in entries:
        if n not in seen:
            seen.add(n)
            uniq.append((n, d))
    blob = write_tar(uniq)
    assert [(e["name"], e["data"]) for e in iter_tar(blob)] == uniq
    import io
    import tarfile as tf
    t = tf.open(fileobj=io.BytesIO(blob))
    for n, d in uniq:
        assert t.extractfile(n).read() == d
