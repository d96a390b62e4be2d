import numpy as np
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.sources import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark, n=16, partitions=4).cache()


def test_blob_roundtrip():
    blob = MM.encode_fake_blob(8, 6, 3, seed=5)
    arr = MM.decode_fake_blob(blob)
    assert arr.shape == (6, 8, 3)
    blob2 = MM.encode_fake_blob(8, 6, 3, seed=5)
    assert blob == blob2  # deterministic


def test_media_table(spark, media):
    rows = media.collect()
    assert len(rows) == 16
    kinds = {r.media_id: r.kind for r in rows}
    assert kinds[0] == "video" and kinds[1] == "image"
    r0 = next(r for r in rows if r.media_id == 0)
    assert r0.meta.n_frames == 4
    assert len(r0.blob) == 4 * (16 + r0.meta.width * r0.meta.height * 3)


def test_extract_features_matches_numpy(spark, media):
    feats = {r.media_id: r for r in MM.extract_features(media).collect()}
    r = media.filter("media_id = 1").first()
    frame = MM.decode_fake_blob(bytes(r.blob))
    exp_mean = frame.reshape(-1, 3).mean(axis=0)
    got = feats[1]
    assert np.allclose(got.channel_means, exp_mean)
    assert sum(got.histogram) == frame.size


def test_resize(spark, media):
    out = MM.resize(media, 8, 8)
    r = out.filter("media_id = 3").first()
    assert r.meta.width == 8 and r.meta.height == 8
    arr = MM.decode_fake_blob(bytes(r.blob))
    assert arr.shape == (8, 8, 3)


def test_sample_frames(spark, media):
    frames = MM.sample_frames(media, every=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert sorted(by_media[0]) == [0, 2]   # video: frames 0,2 of 4
    assert by_media[1] == [0]              # image: single frame
    f2 = next(r for r in frames if r.media_id == 0 and r.frame_idx == 2)
    assert MM.decode_fake_blob(bytes(f2.blob)).shape[2] == 3


def test_unimplemented_backend_raises(spark, media):
    with pytest.raises(Exception) as exc:
        MM.extract_features(media, backend="pillow").collect()
    assert "NotImplementedError" in str(exc.value) or "decode backend" in str(exc.value)


def test_ppm_bmp_roundtrip():
    """Real codecs (r3): PPM P6 and 24-bit BMP encode->decode are exact,
    including BMP row padding (odd widths) and comment-bearing PPM headers."""
    import numpy as np

    from imagery_utils_spark.sources.multimodal import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm)

    rng = np.random.default_rng(3)
    for w, h in [(5, 4), (16, 9), (1, 1), (7, 3)]:  # odd widths pad BMP rows
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        assert (decode_bmp(encode_bmp(img)) == img).all()
    # PPM header with a comment line
    img = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    blob = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert (decode_ppm(blob) == img).all()


def test_extract_features_real_codec_end_to_end(spark):
    """A PPM-blob media table through the same mapInPandas feature path that
    the fake backend uses — the decode path is real, not stubbed."""
    import numpy as np
    import pandas as pd

    from imagery_utils_spark.sources.multimodal import (
        MEDIA_SCHEMA, encode_ppm, extract_features)

    rng = np.random.default_rng(11)
    rows = []
    imgs = {}
    for mid in range(6):
        w, h = 8 + mid, 5 + (mid % 3)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        imgs[mid] = img
        rows.append((mid, "image", encode_ppm(img), (w, h, 3, 1)))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_features(df, backend="ppm").collect()}
    for mid, img in imgs.items():
        assert np.allclose(got[mid].channel_means,
                           img.reshape(-1, 3).mean(axis=0))
        assert np.allclose(got[mid].histogram,
                           np.histogram(img, bins=8, range=(0, 256))[0])


def test_auto_backend_sniffs_containers(spark):
    import numpy as np

    from imagery_utils_spark.sources.multimodal import (
        MEDIA_SCHEMA, encode_bmp, encode_fake_blob, encode_ppm,
        extract_features)

    img = np.full((4, 4, 3), 100, dtype=np.uint8)
    rows = [
        (0, "image", encode_ppm(img), (4, 4, 3, 1)),
        (1, "image", encode_bmp(img), (4, 4, 3, 1)),
        (2, "image", encode_fake_blob(4, 4, 3, seed=0), (4, 4, 3, 1)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = extract_features(df, backend="auto").collect()
    assert len(got) == 3
    by_id = {r.media_id: r.channel_means for r in got}
    assert by_id[0] == [100.0, 100.0, 100.0]
    assert by_id[1] == [100.0, 100.0, 100.0]


def test_png_roundtrip_and_filters():
    """Roundtrip for gray/RGB/RGBA, plus decode of every PNG row filter
    (Sub/Up/Average/Paeth forward-filtered by the test, independently of
    the encoder which always emits filter 0)."""
    import struct
    import zlib

    import numpy as np

    from imagery_utils_spark.sources.multimodal import (
        _PNG_MAGIC, decode_png, encode_png)

    rng = np.random.default_rng(7)
    for shape in [(9, 7), (9, 7, 3), (9, 7, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()

    # hand-filtered PNG: one row per filter type
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, c = img.shape
    stride, bpp = w * c, c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        filt = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (cur[x] - pred) & 0xFF
        raw += bytes([ftype]) + filt.astype(np.uint8).tobytes()

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    blob = (_PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    assert (decode_png(blob) == img).all()


def test_png_unsupported_variants_raise():
    import pytest as _pytest

    from imagery_utils_spark.sources.multimodal import decode_png, encode_png
    import numpy as np

    with _pytest.raises(ValueError):
        decode_png(b"nope")
    with _pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 2), dtype=np.uint8))


def _psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient_rgb(h=48, w=64):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                     (xx + yy) * 255 // (w + h - 2)], axis=2).astype(np.uint8)


def test_jpeg_roundtrip_444_and_420():
    from imagery_utils_spark.sources.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb()
    for q, sub, floor in [(95, False, 45), (85, False, 40), (85, True, 35)]:
        blob = encode_jpeg(img, quality=q, subsample=sub)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        dec = decode_jpeg(blob)
        assert dec.shape == img.shape
        assert _psnr(img, dec) > floor, (q, sub)


def test_jpeg_grayscale_odd_size_and_restart_markers():
    import numpy as np

    from imagery_utils_spark.sources.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:45, 0:53]
    g = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (45, 53) and _psnr(g, dec) > 35

    img = _gradient_rgb()
    for ri in (1, 3):
        for sub in (False, True):
            with_rst = decode_jpeg(
                encode_jpeg(img, quality=85, subsample=sub, restart_interval=ri))
            without = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
            assert (with_rst == without).all()  # segmenting must not change pixels


def test_jpeg_auto_sniff_and_declared_limits():
    import pytest as _pytest

    from imagery_utils_spark.sources.jpeg import encode_jpeg
    from imagery_utils_spark.sources.multimodal import _decode

    img = _gradient_rgb(16, 16)
    blob = encode_jpeg(img)
    assert _decode(blob, "auto").shape == img.shape
    assert _decode(blob, "jpeg").shape == img.shape
    # a baseline scan relabeled SOF2 is an INVALID progressive band
    # (Ss=0, Se=63) — rejected loudly, not mis-decoded
    from imagery_utils_spark.sources.jpeg import decode_jpeg
    bad = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError):
        decode_jpeg(bad)
    # a baseline scan relabeled SOF3 is invalid as LOSSLESS too: its
    # DCT SOS carries Ss=0, not a 1..7 predictor — rejected, not
    # mis-decoded (lossless itself is now implemented, Annex H)
    bad2 = blob.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with _pytest.raises(ValueError):
        decode_jpeg(bad2)
    # hierarchical stays a declared limit
    bad3 = blob.replace(b"\xff\xc0", b"\xff\xc5", 1)
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bad3)


def test_wav_roundtrip_and_audio_features(spark):
    import numpy as np

    from imagery_utils_spark.sources.multimodal import (
        decode_wav, encode_wav, extract_audio_features)

    t = np.arange(16000, dtype=np.float64) / 16000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    blob = encode_wav(tone, 16000)
    back, rate = decode_wav(blob)
    assert rate == 16000 and (back[:, 0] == tone).all()

    silent = encode_wav(np.zeros(8000, dtype=np.int16), 8000)
    df = spark.createDataFrame([(1, blob), (2, silent)], "media_id long, blob binary")
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["duration_s"] == 1.0
    # 440 Hz sine: RMS = amp/sqrt(2), ZCR = 2 crossings per cycle
    assert abs(rows[1]["rms"] - 12000 / 2 ** 0.5) < 100
    assert abs(rows[1]["zero_crossing_rate"] - 2 * 440 / 16000) < 0.005
    assert rows[2]["rms"] == 0.0 and rows[2]["duration_s"] == 1.0


def test_mjpeg_container_and_demux_sampling(spark):
    import numpy as np

    from imagery_utils_spark.sources.jpeg import decode_jpeg
    from imagery_utils_spark.sources.multimodal import (
        decode_mjpeg, encode_mjpeg, sample_mjpeg_frames)

    frames = [_gradient_rgb(24, 32), _gradient_rgb(24, 32)[::-1].copy(),
              _gradient_rgb(24, 32)[:, ::-1].copy()]
    blob = encode_mjpeg(frames, quality=90)
    decoded = decode_mjpeg(blob)
    assert len(decoded) == 3
    for orig, dec in zip(frames, decoded):
        assert dec.shape == orig.shape and _psnr(orig, dec) > 35

    df = spark.createDataFrame([(7, blob)], "media_id long, blob binary")
    out = sample_mjpeg_frames(df, every=2).collect()
    assert [(r["media_id"], r["frame_idx"]) for r in out] == [(7, 0), (7, 2)]
    # demuxed frames are standalone JPEGs decodable on their own
    assert _psnr(frames[2], decode_jpeg(bytes(out[1]["blob"]))) > 35


def test_jpeg_extreme_sizes_and_empty_wav():
    import numpy as np

    from imagery_utils_spark.sources.jpeg import decode_jpeg, encode_jpeg
    from imagery_utils_spark.sources.multimodal import decode_wav, encode_wav

    for shape in [(1, 1, 3), (1, 1), (5, 3, 3), (7, 9)]:
        img = (np.arange(np.prod(shape)) % 256).astype(np.uint8).reshape(shape)
        for sub in (False, True):
            if img.ndim == 2 and sub:
                continue
            dec = decode_jpeg(encode_jpeg(img, subsample=sub))
            assert dec.shape == img.shape

    samples, rate = decode_wav(encode_wav(np.zeros(0, dtype=np.int16)))
    assert samples.shape == (0, 1) and rate == 16000


# ---------------------------------------------------- MP4 / ISO BMFF (r5)


def test_mp4_roundtrip_and_layout():
    import struct

    import numpy as np

    from imagery_utils_spark.sources.jpeg import decode_jpeg, encode_jpeg
    from imagery_utils_spark.sources.multimodal import (
        decode_mp4, demux_mp4, encode_mp4_mjpeg, iter_mp4_frames)

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
              for _ in range(5)]
    blob = encode_mp4_mjpeg(frames, fps=24)

    # layout: ftyp first, moov before mdat (fast start)
    assert blob[4:8] == b"ftyp"
    assert blob.index(b"moov") < blob.index(b"mdat")

    info = demux_mp4(blob)
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (64, 48)
    assert info["timescale"] == 24 and info["duration"] == 5
    assert len(info["samples"]) == 5
    # every sample offset lands on a JPEG SOI marker
    for off, size in info["samples"]:
        assert blob[off:off + 2] == b"\xff\xd8"
        assert blob[off + size - 2:off + size] == b"\xff\xd9"

    # demuxed sample bytes ARE the standalone JPEGs
    for raw, f in zip(iter_mp4_frames(blob), frames):
        assert raw == encode_jpeg(f, quality=85)
    # decode parity with the bare codec
    for dec, f in zip(decode_mp4(blob), frames):
        assert (dec == decode_jpeg(encode_jpeg(f, quality=85))).all()


def test_mp4_multichunk_stsc_and_co64():
    """Demux must expand multi-run stsc over several chunks and read co64
    (64-bit offsets) — the shapes real muxers emit."""
    import struct

    from imagery_utils_spark.sources import multimodal as M

    samples = [b"\xff\xd8AA\xff\xd9", b"\xff\xd8BBB\xff\xd9",
               b"\xff\xd8C\xff\xd9"]
    sizes = [len(s) for s in samples]
    ftyp = M._box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    # chunks: chunk1 = samples 0,1 ; chunk2 = sample 2
    entry = (b"\x00" * 6 + struct.pack(">H", 1) + struct.pack(">HH", 0, 0)
             + b"\x00" * 12 + struct.pack(">HHIII", 8, 6, 0x480000, 0x480000, 0)
             + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stsd = M._fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + M._box(b"jpeg", entry))
    stts = M._fullbox(b"stts", 0, 0, struct.pack(">III", 1, 3, 1))
    stsc = M._fullbox(b"stsc", 0, 0, struct.pack(">I", 2)
                      + struct.pack(">III", 1, 2, 1)
                      + struct.pack(">III", 2, 1, 1))
    stsz = M._fullbox(b"stsz", 0, 0, struct.pack(">II", 0, 3)
                      + struct.pack(">3I", *sizes))
    mdhd = M._fullbox(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 10, 3,
                                                 0x55C4, 0))
    hdlr = M._fullbox(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide")
                      + b"\x00" * 12 + b"V\x00")

    def build(chunk_offs, use_co64):
        if use_co64:
            stco = M._fullbox(b"co64", 0, 0, struct.pack(">I", 2)
                              + struct.pack(">2Q", *chunk_offs))
        else:
            stco = M._fullbox(b"stco", 0, 0, struct.pack(">I", 2)
                              + struct.pack(">2I", *chunk_offs))
        stbl = M._box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = M._box(b"minf", stbl)
        mdia = M._box(b"mdia", mdhd + hdlr + minf)
        moov = M._box(b"moov", M._box(b"trak", mdia))
        mdat_payload = b"".join(samples)
        head = ftyp + moov
        blob = head + M._box(b"mdat", mdat_payload)
        # chunk offsets: chunk1 at mdat start, chunk2 after samples 0+1
        off1 = len(head) + 8
        return blob, (off1, off1 + sizes[0] + sizes[1])

    for use_co64 in (False, True):
        blob, offs = build((0, 0), use_co64)
        blob, offs = build(offs, use_co64)
        info = M.demux_mp4(blob)
        got = [blob[o:o + s] for o, s in info["samples"]]
        assert got == samples, f"co64={use_co64}"


def test_sample_mp4_frames_spark(spark):
    import numpy as np

    from imagery_utils_spark.sources.jpeg import decode_jpeg
    from imagery_utils_spark.sources.multimodal import (
        encode_mp4_mjpeg, sample_mp4_frames)

    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
              for _ in range(6)]
    blob = encode_mp4_mjpeg(frames, fps=10)
    media = spark.createDataFrame([(1, bytearray(blob))],
                                  "media_id long, blob binary")
    rows = sample_mp4_frames(media, every=2).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
    for r in rows:
        img = decode_jpeg(bytes(r.blob))
        assert img.shape == (32, 32, 3)


# ------------------------------------------------------- MP3 demux (r5)


def test_parse_mp3_frames():
    from imagery_utils_spark.sources.multimodal import parse_mp3_frames

    # MPEG1 Layer III 128 kbps @ 44100: 144*128000//44100 = 417 bytes
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = hdr + b"\x00" * (417 - 4)
    pad_hdr = bytes([0xFF, 0xFB, 0x92, 0x00])    # padding bit -> 418
    pad_frame = pad_hdr + b"\x00" * (418 - 4)
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    blob = id3 + frame + pad_frame + frame + b"TAG" + b"\x00" * 125
    frames = parse_mp3_frames(blob)
    assert len(frames) == 3
    assert [f["size"] for f in frames] == [417, 418, 417]
    assert frames[0]["offset"] == len(id3)
    assert frames[1]["offset"] == len(id3) + 417
    assert all(f["bitrate_kbps"] == 128 and f["sample_rate"] == 44100
               and f["samples"] == 1152 for f in frames)

    # MPEG2 Layer III 64 kbps @ 22050: 72*64000//22050 = 208
    h2 = bytes([0xFF, 0xF3, 0x80, 0x00])
    f2 = h2 + b"\x00" * (208 - 4)
    got = parse_mp3_frames(f2 * 2)
    assert len(got) == 2 and got[0]["size"] == 208
    assert got[0]["sample_rate"] == 22050 and got[0]["samples"] == 576

    # garbage stops cleanly
    assert parse_mp3_frames(b"\x00\x01\x02") == []


def test_mp3_stream_stats_spark(spark):
    from imagery_utils_spark.sources.multimodal import mp3_stream_stats

    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])        # MPEG1 L3 128k @44100
    frame = hdr + b"\x00" * (417 - 4)
    media = spark.createDataFrame(
        [(1, bytearray(frame * 3)), (2, bytearray(b"not mp3 data"))],
        "media_id long, blob binary")
    rows = {r.media_id: r for r in mp3_stream_stats(media).collect()}
    assert rows[1].n_frames == 3
    assert rows[1].duration_s == pytest.approx(3 * 1152 / 44100)
    assert rows[1].mean_bitrate_kbps == 128.0
    assert rows[1].sample_rate == 44100
    assert rows[2].n_frames == 0 and rows[2].duration_s == 0.0
