"""Matroska/EBML container (sources/matroska.py) — mux/demux/lacing.

The reference has no video path (extension scope); these tests pin the
container layout to RFC 8794 + the Matroska element registry and the
frame-sampling contract shared with the MJPG / MP4 containers.
"""
import struct

import numpy as np
import pytest

from imagery_utils_spark.sources import matroska as M
from imagery_utils_spark.sources.jpeg import decode_jpeg, encode_jpeg


def test_mkv_roundtrip_and_layout():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, size=(40, 56, 3), dtype=np.uint8)
              for _ in range(5)]
    blob = M.encode_mkv_mjpeg(frames, fps=25)

    assert blob[:4] == b"\x1a\x45\xdf\xa3"       # EBML magic
    info = M.demux_mkv(blob)
    assert info["codec"] == "V_MJPEG"
    assert info["doctype"] == "matroska"
    assert (info["width"], info["height"]) == (56, 40)
    assert info["timestamp_scale_ns"] == 1_000_000
    assert info["duration_ms"] == pytest.approx(200.0)
    assert len(info["samples"]) == 5
    assert [ts for _, _, ts in info["samples"]] == [0, 40, 80, 120, 160]
    for off, size, _ in info["samples"]:
        assert blob[off:off + 2] == b"\xff\xd8"
        assert blob[off + size - 2:off + size] == b"\xff\xd9"

    for raw, f in zip(M.iter_mkv_frames(blob), frames):
        assert raw == encode_jpeg(f, quality=85)
    for dec, f in zip(M.decode_mkv(blob), frames):
        assert (dec == decode_jpeg(encode_jpeg(f, quality=85))).all()


def test_mkv_webm_doctype_and_autosniff():
    from imagery_utils_spark.sources.multimodal import _decode

    f = np.full((16, 16, 3), 128, dtype=np.uint8)
    blob = M.encode_mkv_mjpeg([f], doctype="webm")
    assert M.demux_mkv(blob)["doctype"] == "webm"
    img = _decode(blob, "auto")
    assert img.shape == (16, 16, 3)


def _track(codec=b"V_MJPEG"):
    return M._el(M._TRACKS, M._el(M._TRACK_ENTRY, b"".join([
        M._el(M._TRACK_NUM, b"\x01"), M._el(M._TRACK_TYPE, b"\x01"),
        M._el(M._CODEC_ID, codec),
        M._el(M._VIDEO, M._el(M._PIX_W, b"\x10") + M._el(M._PIX_H, b"\x10")),
    ])))


def _header():
    return M._el(M._EBML, M._el(M._DOCTYPE, b"matroska"))


def _svint(delta: int, k: int = 2) -> bytes:
    bias = (1 << (7 * k - 1)) - 1
    return ((1 << (7 * k)) | (delta + bias)).to_bytes(k, "big")


@pytest.mark.parametrize("lacing", ["xiph", "fixed", "ebml"])
def test_mkv_lacing_modes(lacing):
    """Hand-built laced SimpleBlocks — the shapes real muxers emit."""
    frames = [b"\xff\xd8" + b"A" * 300 + b"\xff\xd9",
              b"\xff\xd8" + b"B" * 7 + b"\xff\xd9",
              b"\xff\xd8" + b"C" * 300 + b"\xff\xd9"]
    if lacing == "fixed":
        frames = [f + b"P" * (304 - len(f)) for f in frames]  # equal sizes
    head = b"\x81" + struct.pack(">h", 0)
    if lacing == "xiph":
        # size 304 = 255 + 49 ; size 11
        lace = b"\x02" + bytes([255, 49]) + bytes([11])
        payload = head + b"\x82" + lace + b"".join(frames)
    elif lacing == "fixed":
        payload = head + b"\x84" + b"\x02" + b"".join(frames)
    else:
        lace = b"\x02" + M._vint(len(frames[0])) \
            + _svint(len(frames[1]) - len(frames[0]))
        payload = head + b"\x86" + lace + b"".join(frames)
    cluster = M._el(M._CLUSTER, M._el(M._CLUSTER_TS, b"\x00")
                    + M._el(M._SIMPLE_BLOCK, payload))
    blob = _header() + M._el(M._SEGMENT, _track() + cluster)
    info = M.demux_mkv(blob)
    got = [blob[o:o + s] for o, s, _ in info["samples"]]
    assert got == frames, lacing


def test_mkv_unknown_size_and_multicluster():
    """Unknown-size Segment/Cluster (streamed-webm shape) + two clusters
    with distinct cluster timestamps."""
    f1 = b"\xff\xd8XX\xff\xd9"
    f2 = b"\xff\xd8YYY\xff\xd9"
    blk1 = M._el(M._SIMPLE_BLOCK, b"\x81" + struct.pack(">h", 5) + b"\x80" + f1)
    blk2 = M._el(M._SIMPLE_BLOCK, b"\x81" + struct.pack(">h", 3) + b"\x80" + f2)
    c1 = M._el(M._CLUSTER, M._el(M._CLUSTER_TS, b"\x00") + blk1)
    # second cluster: UNKNOWN size (vint all-ones), runs to segment end
    c2_body = M._el(M._CLUSTER_TS, bytes([100])) + blk2
    c2 = M._id_bytes(M._CLUSTER) + b"\xff" + c2_body
    seg_body = _track() + c1 + c2
    # segment itself also unknown-size
    blob = _header() + M._id_bytes(M._SEGMENT) + b"\xff" + seg_body
    info = M.demux_mkv(blob)
    assert [(blob[o:o + s], ts) for o, s, ts in info["samples"]] \
        == [(f1, 5), (f2, 103)]


def test_mkv_foreign_codec_demuxes_but_wont_decode():
    blk = M._el(M._SIMPLE_BLOCK, b"\x81\x00\x00\x80" + b"\x00" * 20)
    cluster = M._el(M._CLUSTER, M._el(M._CLUSTER_TS, b"\x00") + blk)
    blob = _header() + M._el(M._SEGMENT, _track(b"V_VP9") + cluster)
    info = M.demux_mkv(blob)
    assert info["codec"] == "V_VP9" and len(info["samples"]) == 1
    with pytest.raises(NotImplementedError):
        M.decode_mkv(blob)
    with pytest.raises(ValueError):
        M.demux_mkv(b"RIFFnope")


def test_sample_mkv_frames_spark(spark):
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
              for _ in range(6)]
    blob = M.encode_mkv_mjpeg(frames, fps=10)
    media = spark.createDataFrame([(3, bytearray(blob))],
                                  "media_id long, blob binary")
    rows = M.sample_mkv_frames(media, every=3).collect()
    assert sorted((r.frame_idx, r.ts_ms) for r in rows) == [(0, 0), (3, 300)]
    for r in rows:
        assert decode_jpeg(bytes(r.blob)).shape == (24, 24, 3)
