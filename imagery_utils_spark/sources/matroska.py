"""Matroska / EBML (webm-shape) container — mux, demux, frame sampling.

From the PUBLIC specs only: RFC 8794 (EBML: variable-length element IDs,
vint sizes, unknown-size elements) and the Matroska element registry
(EBML header / Segment / Info / Tracks / Cluster / SimpleBlock, codec id
``V_MJPEG``).  The reference repo has no video path at all — this is
extension scope for the multimodal training-data pipeline, completing the
container trio (MJPG, MP4/ISO-BMFF, Matroska) so every frame-sampling
contract works on real containers.  The video samples are baseline JPEGs
from the repo's own from-spec T.81 codec (:mod:`.jpeg`); industry lossy
codecs (VP8/VP9/h264) remain a declared limit — they need DSP codec
libraries absent in this environment, and ``decode_mkv`` raises
``NotImplementedError`` for them while the demux still yields the raw
sample ranges.

Demux handles the shapes real muxers emit: unknown-size Segment/Cluster
(live-streamed webm), multiple clusters, and all three SimpleBlock lacing
modes (Xiph, fixed-size, EBML) per the Matroska spec §SimpleBlock.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

# Matroska element IDs (marker bits retained, as registered)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUX_APP = 0x4D80
_WRITE_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUM = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

_NS_PER_MS = 1_000_000


def _id_bytes(eid: int) -> bytes:
    n = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(n, "big")


def _vint(value: int) -> bytes:
    """Encode a size as a minimal-length EBML vint (marker in top bits)."""
    for k in range(1, 9):
        if value <= (1 << (7 * k)) - 2:          # all-ones reserved = unknown
            return ((1 << (7 * k)) | value).to_bytes(k, "big")
    raise ValueError("vint too large")


def _el(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + _vint(len(payload)) + payload


def _uint_payload(value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return value.to_bytes(n, "big")


def _read_vint(blob: bytes, pos: int, keep_marker: bool):
    """-> (value, new_pos, is_unknown). IDs keep the marker; sizes strip it."""
    b0 = blob[pos]
    if b0 == 0:
        raise ValueError("ebml: invalid vint lead byte 0x00")
    k = 8 - b0.bit_length() + 1                  # total length in bytes
    raw = int.from_bytes(blob[pos:pos + k], "big")
    if keep_marker:
        return raw, pos + k, False
    value = raw & ((1 << (7 * k)) - 1)
    return value, pos + k, value == (1 << (7 * k)) - 1


# ------------------------------------------------------------------ mux


def encode_mkv_mjpeg(frames: list[np.ndarray], fps: int = 30,
                     quality: int = 85, doctype: str = "matroska") -> bytes:
    """Frames -> a real Matroska file: EBML header, Segment(Info, Tracks
    with a ``V_MJPEG`` video track, one Cluster of keyframe SimpleBlocks,
    no lacing).  Roundtrips through :func:`demux_mkv` / :func:`decode_mkv`.
    ``doctype='webm'`` writes the webm doctype (the container layout is
    identical; webm-the-profile mandates VP8/VP9 which we cannot encode —
    the V_MJPEG track is honest about that)."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    header = _el(_EBML, b"".join([
        _el(0x4286, b"\x01"),                    # EBMLVersion
        _el(0x42F7, b"\x01"),                    # EBMLReadVersion
        _el(0x42F2, b"\x04"),                    # EBMLMaxIDLength
        _el(0x42F3, b"\x08"),                    # EBMLMaxSizeLength
        _el(_DOCTYPE, doctype.encode()),
        _el(0x4287, b"\x04"),                    # DocTypeVersion
        _el(0x4285, b"\x02"),                    # DocTypeReadVersion
    ]))
    ms_per_frame = 1000.0 / fps
    info = _el(_INFO, b"".join([
        _el(_TS_SCALE, _uint_payload(_NS_PER_MS)),
        _el(_DURATION, struct.pack(">d", ms_per_frame * len(frames))),
        _el(_MUX_APP, b"imagery_utils_spark"),
        _el(_WRITE_APP, b"imagery_utils_spark"),
    ]))
    tracks = _el(_TRACKS, _el(_TRACK_ENTRY, b"".join([
        _el(_TRACK_NUM, b"\x01"),
        _el(_TRACK_UID, b"\x01"),
        _el(_TRACK_TYPE, b"\x01"),               # video
        _el(_CODEC_ID, b"V_MJPEG"),
        _el(_VIDEO, _el(_PIX_W, _uint_payload(w))
            + _el(_PIX_H, _uint_payload(h))),
    ])))
    blocks = []
    for i, j in enumerate(jpegs):
        rel_ts = int(round(i * ms_per_frame))
        blocks.append(_el(_SIMPLE_BLOCK,
                          b"\x81" + struct.pack(">h", rel_ts) + b"\x80" + j))
    cluster = _el(_CLUSTER, _el(_CLUSTER_TS, b"\x00") + b"".join(blocks))
    return header + _el(_SEGMENT, info + tracks + cluster)


# ---------------------------------------------------------------- demux


def _iter_elements(blob: bytes, pos: int, end: int):
    """Yield (id, body_start, body_end) children of [pos, end); an
    unknown-size element extends to the enclosing end (RFC 8794 §6.2)."""
    while pos + 2 <= end:
        eid, pos, _ = _read_vint(blob, pos, keep_marker=True)
        size, pos, unknown = _read_vint(blob, pos, keep_marker=False)
        body_end = end if unknown else pos + size
        yield eid, pos, body_end
        pos = body_end


def _child(blob: bytes, path: list[int], pos: int, end: int):
    for eid, body, body_end in _iter_elements(blob, pos, end):
        if eid == path[0]:
            if len(path) == 1:
                return body, body_end
            return _child(blob, path[1:], body, body_end)
    raise ValueError(f"mkv: element {path[0]:#x} not found")


def _block_frames(blob: bytes, body: int, body_end: int):
    """SimpleBlock payload -> (rel_ts_ms, [(offset, size)]), expanding the
    lacing mode (flags bits 0x06: 0 none, 2 Xiph, 4 fixed, 6 EBML)."""
    _track, pos, _ = _read_vint(blob, body, keep_marker=False)
    (rel_ts,) = struct.unpack_from(">h", blob, pos)
    flags = blob[pos + 2]
    pos += 3
    lacing = flags & 0x06
    if lacing == 0:
        return rel_ts, [(pos, body_end - pos)]
    n_frames = blob[pos] + 1
    pos += 1
    sizes: list[int] = []
    if lacing == 0x02:                           # Xiph: 255-run sizes
        for _ in range(n_frames - 1):
            s = 0
            while blob[pos] == 255:
                s += 255
                pos += 1
            s += blob[pos]
            pos += 1
            sizes.append(s)
    elif lacing == 0x04:                         # fixed-size
        per = (body_end - pos) // n_frames
        sizes = [per] * (n_frames - 1)
    else:                                        # EBML: first abs, then deltas
        first, npos, _ = _read_vint(blob, pos, keep_marker=False)
        sizes.append(first)
        pos = npos
        cur = first
        for _ in range(n_frames - 2):
            b0 = blob[pos]
            k = 8 - b0.bit_length() + 1
            raw, pos, _ = _read_vint(blob, pos, keep_marker=False)
            cur += raw - ((1 << (7 * k - 1)) - 1)
            sizes.append(cur)
    sizes.append(body_end - pos - sum(sizes))    # last frame: remainder
    out = []
    for s in sizes:
        out.append((pos, s))
        pos += s
    return rel_ts, out


def demux_mkv(blob: bytes) -> dict:
    """Parse the container -> ``{codec, doctype, width, height,
    timestamp_scale_ns, duration_ms, samples: [(offset, size, ts_ms)]}``.
    Pure demux: no sample is decoded.  Handles unknown-size Segment and
    Clusters, multiple Clusters, and all three lacing modes."""
    if blob[:4] != _id_bytes(_EBML):
        raise ValueError("not an EBML/Matroska file")
    hdr_body, hdr_end = _child(blob, [_EBML], 0, len(blob))
    doctype = "matroska"
    for eid, body, bend in _iter_elements(blob, hdr_body, hdr_end):
        if eid == _DOCTYPE:
            doctype = blob[body:bend].decode("ascii", "replace")
    seg, seg_end = _child(blob, [_SEGMENT], hdr_end, len(blob))

    ts_scale, duration_ms = _NS_PER_MS, None
    codec, width, height = None, None, None
    samples: list[tuple[int, int, int]] = []
    for eid, body, bend in _iter_elements(blob, seg, seg_end):
        if eid == _INFO:
            for e2, b2, e2end in _iter_elements(blob, body, bend):
                if e2 == _TS_SCALE:
                    ts_scale = int.from_bytes(blob[b2:e2end], "big")
                elif e2 == _DURATION:
                    raw = blob[b2:e2end]
                    duration_ms = struct.unpack(
                        ">f" if len(raw) == 4 else ">d", raw)[0]
        elif eid == _TRACKS:
            entry, entry_end = _child(blob, [_TRACK_ENTRY], body, bend)
            for e2, b2, e2end in _iter_elements(blob, entry, entry_end):
                if e2 == _CODEC_ID:
                    codec = blob[b2:e2end].decode("ascii", "replace")
                elif e2 == _VIDEO:
                    for e3, b3, e3end in _iter_elements(blob, b2, e2end):
                        if e3 == _PIX_W:
                            width = int.from_bytes(blob[b3:e3end], "big")
                        elif e3 == _PIX_H:
                            height = int.from_bytes(blob[b3:e3end], "big")
        elif eid == _CLUSTER:
            cluster_ts = 0
            for e2, b2, e2end in _iter_elements(blob, body, bend):
                if e2 == _CLUSTER_TS:
                    cluster_ts = int.from_bytes(blob[b2:e2end], "big")
                elif e2 == _SIMPLE_BLOCK:
                    rel_ts, frames = _block_frames(blob, b2, e2end)
                    for off, size in frames:
                        samples.append((off, size, cluster_ts + rel_ts))
    if codec is None:
        raise ValueError("mkv: no track CodecID found")
    return {"codec": codec, "doctype": doctype, "width": width,
            "height": height, "timestamp_scale_ns": ts_scale,
            "duration_ms": duration_ms, "samples": samples}


def iter_mkv_frames(blob: bytes):
    """Yield raw per-sample bytes (JPEGs for V_MJPEG) — demux only."""
    for off, size, _ts in demux_mkv(blob)["samples"]:
        yield blob[off:off + size]


def decode_mkv(blob: bytes) -> list[np.ndarray]:
    info = demux_mkv(blob)
    if info["codec"] != "V_MJPEG":
        raise NotImplementedError(
            f"mkv sample codec {info['codec']!r} (e.g. VP8/VP9/h264) needs "
            "a DSP codec library absent here; the native path is V_MJPEG")
    from .jpeg import decode_jpeg

    return [decode_jpeg(blob[o:o + s]) for o, s, _ in info["samples"]]


def sample_mkv_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Every ``every``-th sample re-emitted as a standalone JPEG row without
    decoding (same contract as sample_mjpeg_frames / sample_mp4_frames)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("blob", T.BinaryType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                b = bytes(blob)
                for idx, (off, size, ts) in enumerate(
                        demux_mkv(b)["samples"]):
                    if idx % every == 0:
                        rows.append((int(mid), idx, int(ts),
                                     b[off:off + size]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "blob"])

    return media.mapInPandas(run, schema=out_schema)
