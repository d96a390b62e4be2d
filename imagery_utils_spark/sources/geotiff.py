"""Pure-python GeoTIFF writer/reader (uncompressed baseline TIFF 6.0 +
GeoTIFF 1.1 georeferencing tags).

Closes the K4 residual: the reference emits one GeoTIFF per mosaic tile
(/root/reference/pgc_mosaic_build_tile.py; gdalwarp outputs in
lib/ortho_functions.py) and rounds 1-3 could only produce BMP/PPM + world
files because no raster library exists in this container. TIFF itself is
just a tag directory over raw strips, and GeoTIFF georeferencing is three
more tags — all plain ``struct`` packing, written here from the published
TIFF 6.0 and OGC GeoTIFF specs:

* baseline tags: width/length/bits/compression(1=none)/photometric
  (1=gray, 2=RGB)/strip offsets+counts/samples/rows-per-strip/planar(1);
* GeoTIFF tags: ModelPixelScale (33550), ModelTiepoint (33922) — the
  affine a world file carries — and the GeoKeyDirectory (34735) with
  model type + raster type + the EPSG code (geographic 2048 or projected
  3072, chosen by EPSG range like the engine's EPSG picker).

One strip per image (tiles here are bounded); single-band uint8/uint16 or
3-band uint8. The reader parses any single-strip uncompressed file this
writer produces and returns (array, geotransform, epsg) for roundtrip
verification — GDAL compatibility follows from the spec but cannot be
asserted in this sandbox (no GDAL), which is the declared limit.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"  # little-endian TIFF magic

# tag ids
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_PREDICTOR = 317
_STRIP_OFF, _SAMPLES, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _SAMPLE_FMT = 284, 339
_MODEL_SCALE, _MODEL_TIEPOINT, _GEO_KEYS = 33550, 33922, 34735

_SHORT, _LONG, _DOUBLE = 3, 4, 12


def _geo_keys(epsg: int) -> list[int]:
    """GeoKeyDirectory shorts: header (1,1,0,n) then per-key
    (id, location=0, count=1, value)."""
    geographic = 4000 <= epsg < 5000  # the engine's EPSG-range convention
    keys = [
        (1024, 0, 1, 2 if geographic else 1),   # GTModelType
        (1025, 0, 1, 1),                        # GTRasterType = PixelIsArea
        ((2048 if geographic else 3072), 0, 1, epsg),
    ]
    out = [1, 1, 0, len(keys)]
    for k in keys:
        out.extend(k)
    return out


def encode_geotiff(arr: np.ndarray, xmin: float, ymin: float, xmax: float,
                   ymax: float, epsg: int = 4326,
                   compress: str | None = None,
                   predictor: int = 1) -> bytes:
    """HxW (gray, uint8/uint16) or HxWx3 (RGB uint8) -> GeoTIFF bytes.
    North-up geotransform derived from the extent (row 0 = ymax edge).
    ``compress='deflate'`` writes Deflate strips (TIFF compression 8,
    stdlib zlib); ``compress='lzw'`` writes TIFF-LZW strips (tag 5,
    sources/tiff_lzw.py — gdal's default imagery compression, the
    reference's pgc_mosaic_build_tile.py gdal_translate -co
    COMPRESS=LZW)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        samples, photo = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        samples, photo = 3, 2
        if arr.dtype != np.uint8:
            raise ValueError("RGB GeoTIFF must be uint8")
    else:
        raise ValueError("need HxW gray or HxWx3 RGB")
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError("uint8/uint16 only")
    h, w = arr.shape[:2]
    bits = arr.dtype.itemsize * 8
    if arr.dtype == np.uint16:
        arr = arr.astype("<u2")
    if predictor == 2:
        # horizontal differencing (TIFF tag 317=2, gdal PREDICTOR=2):
        # per row, per channel, value - left-neighbor mod 2^bits —
        # turns smooth imagery into near-zero runs the LZW/Deflate
        # dictionary loves
        wide = arr.astype(np.int64)
        if wide.ndim == 2:
            wide[:, 1:] -= arr.astype(np.int64)[:, :-1]
        else:
            wide[:, 1:, :] -= arr.astype(np.int64)[:, :-1, :]
        arr = (wide % (1 << bits)).astype(arr.dtype)
    elif predictor != 1:
        raise NotImplementedError("predictor 1 (none) or 2 (horizontal)")
    strip = arr.tobytes()
    if compress == "deflate":
        import zlib

        strip = zlib.compress(strip, 6)
        comp_tag = 8
    elif compress == "lzw":
        from imagery_utils_spark.sources.tiff_lzw import tiff_lzw_encode

        strip = tiff_lzw_encode(strip)
        comp_tag = 5
    elif compress == "packbits":
        from imagery_utils_spark.sources.packbits import packbits_encode

        strip = packbits_encode(strip, row_bytes=len(strip) // h)
        comp_tag = 32773
    elif compress is None:
        comp_tag = 1
    else:
        raise NotImplementedError(f"compression {compress!r} not supported "
                                  "(lzw, deflate, packbits or None)")

    px = (xmax - xmin) / w
    py = (ymax - ymin) / h
    scale = struct.pack("<3d", px, py, 0.0)
    # tiepoint: raster (0,0) [pixel corner, PixelIsArea] -> (xmin, ymax)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, xmin, ymax, 0.0)
    keys = _geo_keys(epsg)
    keys_b = struct.pack("<%dH" % len(keys), *keys)
    bits_b = struct.pack("<%dH" % samples, *([bits] * samples))
    fmt_b = struct.pack("<%dH" % samples, *([1] * samples))

    # layout: header(8) | strip | external arrays | IFD
    pos = 8
    strip_off = pos
    pos += len(strip)
    ext: list[bytes] = []

    def external(data: bytes) -> int:
        nonlocal pos
        if pos % 2:                    # word-align external values
            ext.append(b"\x00")
            pos += 1
        off = pos
        ext.append(data)
        pos += len(data)
        return off

    entries: list[tuple[int, int, int, int]] = []

    def tag(tid: int, ttype: int, count: int, value_or_data) -> None:
        if isinstance(value_or_data, bytes):
            if len(value_or_data) <= 4:
                v = int.from_bytes(value_or_data.ljust(4, b"\x00"), "little")
                entries.append((tid, ttype, count, v))
            else:
                entries.append((tid, ttype, count, external(value_or_data)))
        else:
            entries.append((tid, ttype, count, int(value_or_data)))

    tag(_W, _LONG, 1, w)
    tag(_H, _LONG, 1, h)
    tag(_BITS, _SHORT, samples, bits_b)
    tag(_COMP, _SHORT, 1, comp_tag)
    tag(_PHOTO, _SHORT, 1, photo)
    tag(_STRIP_OFF, _LONG, 1, strip_off)
    tag(_SAMPLES, _SHORT, 1, samples)
    tag(_ROWS_PER_STRIP, _LONG, 1, h)
    tag(_STRIP_CNT, _LONG, 1, len(strip))
    tag(_PLANAR, _SHORT, 1, 1)
    if predictor == 2:
        tag(_PREDICTOR, _SHORT, 1, 2)
    tag(_SAMPLE_FMT, _SHORT, samples, fmt_b)
    tag(_MODEL_SCALE, _DOUBLE, 3, scale)
    tag(_MODEL_TIEPOINT, _DOUBLE, 6, tiepoint)
    tag(_GEO_KEYS, _SHORT, len(keys), keys_b)

    if pos % 2:
        ext.append(b"\x00")
        pos += 1
    ifd_off = pos
    entries.sort()                     # TIFF requires ascending tag order
    ifd = struct.pack("<H", len(entries))
    for tid, ttype, count, value in entries:
        ifd += struct.pack("<HHII", tid, ttype, count, value & 0xFFFFFFFF)
    ifd += struct.pack("<I", 0)        # no next IFD

    return (_II + struct.pack("<I", ifd_off) + strip + b"".join(ext) + ifd)


_NEW_SUBFILE = 254
_TILE_W, _TILE_L, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325


def _downsample(arr: np.ndarray, f: int, resample: str) -> np.ndarray:
    """gdaladdo-style factor-f overview. ``nearest`` (gdaladdo's default)
    takes the top-left sample of each f x f block; ``average`` is the box
    mean (edge-replicated at ragged borders), rounded back to the dtype."""
    if resample == "nearest":
        return arr[::f, ::f]
    if resample != "average":
        raise ValueError(f"unknown resample {resample!r} (nearest/average)")
    h, w = arr.shape[:2]
    oh, ow = -(-h // f), -(-w // f)
    pad = [(0, oh * f - h), (0, ow * f - w)] + (
        [(0, 0)] if arr.ndim == 3 else [])
    ap = np.pad(arr, pad, mode="edge").astype(np.float64)
    if arr.ndim == 2:
        out = ap.reshape(oh, f, ow, f).mean(axis=(1, 3))
    else:
        out = ap.reshape(oh, f, ow, f, arr.shape[2]).mean(axis=(1, 3))
    return np.round(out).astype(arr.dtype)


def _tile_blobs(arr: np.ndarray, ts: int, deflate: bool) -> list[bytes]:
    """Row-major ts x ts tiles, zero-padded at right/bottom edges (TIFF 6.0
    tiled-image rule: every tile is full-size in the file)."""
    h, w = arr.shape[:2]
    th, tw = -(-h // ts), -(-w // ts)
    pad = [(0, th * ts - h), (0, tw * ts - w)] + (
        [(0, 0)] if arr.ndim == 3 else [])
    ap = np.pad(arr, pad, mode="constant")
    if ap.dtype == np.uint16:
        ap = ap.astype("<u2")
    out = []
    for ty in range(th):
        for tx in range(tw):
            blob = ap[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts].tobytes()
            if deflate:
                import zlib

                blob = zlib.compress(blob, 6)
            out.append(blob)
    return out


def encode_cog(arr: np.ndarray, xmin: float, ymin: float, xmax: float,
               ymax: float, epsg: int = 4326, tile_size: int = 256,
               levels: tuple = (2, 4, 8, 16), resample: str = "nearest",
               compress: str | None = None) -> bytes:
    """Cloud-Optimized GeoTIFF: tiled IFDs + internal factor-2.. overview
    chain, IFDs packed at the file head, tile data ordered smallest overview
    first / full resolution last — the layout a COG range-reader expects
    (OGC 21-026; the reference asserts LAYOUT=COG on its mosaic output,
    /root/reference/tests/test_mosaic.py:160-161, and builds the same
    pyramid levels via ``gdaladdo 2 4 8 16 [30]``,
    pgc_mosaic_build_tile.py:216).

    Same pixel-type envelope as encode_geotiff (gray uint8/uint16 or RGB
    uint8); ``compress='deflate'`` per tile. Georeferencing tags ride on the
    full-resolution IFD; overview IFDs carry NewSubfileType=1."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        samples, photo = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        samples, photo = 3, 2
        if arr.dtype != np.uint8:
            raise ValueError("RGB GeoTIFF must be uint8")
    else:
        raise ValueError("need HxW gray or HxWx3 RGB")
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError("uint8/uint16 only")
    if compress not in (None, "deflate"):
        raise NotImplementedError(f"compression {compress!r} not supported")
    deflate = compress == "deflate"
    comp_tag = 8 if deflate else 1
    bits = arr.dtype.itemsize * 8
    ts = int(tile_size)
    if ts % 16:
        raise ValueError("TIFF tile size must be a multiple of 16")

    pyramid = [arr] + [_downsample(arr, int(f), resample)
                       for f in sorted(levels)]
    level_tiles = [_tile_blobs(a, ts, deflate) for a in pyramid]

    h0, w0 = arr.shape[:2]
    px = (xmax - xmin) / w0
    py = (ymax - ymin) / h0
    scale = struct.pack("<3d", px, py, 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, xmin, ymax, 0.0)
    keys = _geo_keys(epsg)
    keys_b = struct.pack("<%dH" % len(keys), *keys)
    bits_b = struct.pack("<%dH" % samples, *([bits] * samples))
    fmt_b = struct.pack("<%dH" % samples, *([1] * samples))

    # ---- entry specs per IFD (tile offsets patched after layout) --------
    def specs(li: int) -> list:
        a = pyramid[li]
        h, w = a.shape[:2]
        n = len(level_tiles[li])
        e = []
        if li > 0:
            e.append((_NEW_SUBFILE, _LONG, 1, 1))      # reduced-resolution
        e += [
            (_W, _LONG, 1, w), (_H, _LONG, 1, h),
            (_BITS, _SHORT, samples, bits_b),
            (_COMP, _SHORT, 1, comp_tag), (_PHOTO, _SHORT, 1, photo),
            (_SAMPLES, _SHORT, 1, samples), (_PLANAR, _SHORT, 1, 1),
            (_TILE_W, _SHORT, 1, ts), (_TILE_L, _SHORT, 1, ts),
            (_TILE_OFF, _LONG, n, None),               # patched
            (_TILE_CNT, _LONG, n,
             struct.pack("<%dI" % n, *[len(t) for t in level_tiles[li]])),
            (_SAMPLE_FMT, _SHORT, samples, fmt_b),
        ]
        if li == 0:
            e += [(_MODEL_SCALE, _DOUBLE, 3, scale),
                  (_MODEL_TIEPOINT, _DOUBLE, 6, tiepoint),
                  (_GEO_KEYS, _SHORT, len(keys), keys_b)]
        return sorted(e)

    all_specs = [specs(i) for i in range(len(pyramid))]

    # ---- layout pass: IFDs + external arrays first (COG head), then tile
    # data, smallest overview first, full resolution last -----------------
    pos = 8
    ifd_off = []
    for sp in all_specs:
        ifd_off.append(pos)
        pos += 2 + 12 * len(sp) + 4
    ext_off: dict[tuple[int, int], int] = {}
    for li, sp in enumerate(all_specs):
        for tid, ttype, count, data in sp:
            size = 4 * count if tid == _TILE_OFF else (
                len(data) if isinstance(data, bytes) else 0)
            if size > 4 or (tid == _TILE_OFF and count > 1):
                if pos % 2:
                    pos += 1
                ext_off[(li, tid)] = pos
                pos += size
    tile_off: list[list[int]] = [[] for _ in pyramid]
    for li in list(range(len(pyramid) - 1, 0, -1)) + [0]:
        for t in level_tiles[li]:
            if pos % 2:
                pos += 1
            tile_off[li].append(pos)
            pos += len(t)

    # ---- assembly -------------------------------------------------------
    out = bytearray(pos)
    out[0:4] = _II
    struct.pack_into("<I", out, 4, ifd_off[0])
    for li, sp in enumerate(all_specs):
        o = ifd_off[li]
        struct.pack_into("<H", out, o, len(sp))
        o += 2
        for tid, ttype, count, data in sp:
            if tid == _TILE_OFF:
                offs = tile_off[li]
                if count > 1:
                    v = ext_off[(li, tid)]
                    struct.pack_into("<%dI" % count, out, v, *offs)
                else:
                    v = offs[0]
            elif isinstance(data, bytes):
                if len(data) <= 4:
                    v = int.from_bytes(data.ljust(4, b"\x00"), "little")
                else:
                    v = ext_off[(li, tid)]
                    out[v:v + len(data)] = data
            else:
                v = int(data)
            struct.pack_into("<HHII", out, o, tid, ttype, count,
                             v & 0xFFFFFFFF)
            o += 12
        nxt = ifd_off[li + 1] if li + 1 < len(all_specs) else 0
        struct.pack_into("<I", out, o, nxt)
    for li in range(len(pyramid)):
        for t, off in zip(level_tiles[li], tile_off[li]):
            out[off:off + len(t)] = t
    return bytes(out)


def _parse_ifd(blob: bytes, off: int):
    (n,) = struct.unpack_from("<H", blob, off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tid, ttype, count, value = struct.unpack_from(
            "<HHII", blob, off + 2 + 12 * i)
        tags[tid] = (ttype, count, value)
    (nxt,) = struct.unpack_from("<I", blob, off + 2 + 12 * n)
    return tags, nxt


def _tag_longs(blob: bytes, tags: dict, tid: int) -> list[int]:
    """Offset/count tag values as ints — SHORT(3) or LONG(4) typed, inline
    (<= 4 value bytes) or external."""
    ttype, count, value = tags[tid]
    unit = 2 if ttype == _SHORT else 4
    fmt = "H" if ttype == _SHORT else "I"
    if count * unit <= 4:
        return list(struct.unpack("<%d%s" % (count, fmt),
                                  value.to_bytes(4, "little")[:count * unit]))
    return list(struct.unpack_from("<%d%s" % (count, fmt), blob, value))


def decode_cog(blob: bytes):
    """Walk the full IFD chain of a tiled GeoTIFF ->
    (arrays [full, ov2, ov4, ...], geotransform, epsg). Reassembles tiles
    (uncompressed or Deflate) and crops the edge padding."""
    if blob[:4] != _II:
        raise ValueError("not a little-endian TIFF")
    (off,) = struct.unpack_from("<I", blob, 4)
    arrays = []
    gt = None
    epsg = 0
    while off:
        tags, off = _parse_ifd(blob, off)
        if _TILE_OFF not in tags:
            raise NotImplementedError("decode_cog reads tiled IFDs only "
                                      "(use decode_geotiff for strips)")
        w, h = tags[_W][2], tags[_H][2]
        ts = tags[_TILE_W][2]
        samples = tags[_SAMPLES][2] if _SAMPLES in tags else 1
        ttype, cnt_b, val_b = tags[_BITS]
        bits = struct.unpack("<H", (val_b.to_bytes(4, "little")[:2]
                                    if cnt_b * 2 <= 4 else
                                    blob[val_b:val_b + 2]))[0]
        comp = tags[_COMP][2]
        if comp not in (1, 8):
            raise NotImplementedError("only uncompressed / Deflate tiles")
        dt = np.uint8 if bits == 8 else np.dtype("<u2")
        offs = _tag_longs(blob, tags, _TILE_OFF)
        cnts = _tag_longs(blob, tags, _TILE_CNT)
        th, tw = -(-h // ts), -(-w // ts)
        shape = (th * ts, tw * ts) if samples == 1 else (th * ts, tw * ts, samples)
        full = np.zeros(shape, dtype=dt)
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = blob[o:o + c]
            if comp == 8:
                import zlib

                raw = zlib.decompress(raw)
            tile = np.frombuffer(raw, dtype=dt).reshape(
                (ts, ts) if samples == 1 else (ts, ts, samples))
            ty, tx = divmod(i, tw)
            full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts] = tile
        arrays.append(full[:h, :w].copy())
        if _MODEL_SCALE in tags and gt is None:
            px, py, _pz = struct.unpack_from(
                "<3d", blob, tags[_MODEL_SCALE][2])
            tp = struct.unpack_from("<6d", blob, tags[_MODEL_TIEPOINT][2])
            gt = (tp[3] - tp[0] * px, px, 0.0, tp[4] + tp[1] * py, 0.0, -py)
            _t, kc, ko = tags[_GEO_KEYS]
            keys = struct.unpack_from("<%dH" % kc, blob, ko)
            for i in range(4, len(keys), 4):
                if keys[i] in (2048, 3072) and keys[i + 1] == 0:
                    epsg = keys[i + 3]
    return arrays, gt, epsg


def decode_geotiff(blob: bytes):
    """-> (array, (xmin, px, 0, ymax, 0, -py) GDAL-style geotransform,
    epsg). Uncompressed, LZW or Deflate strips; single- or multi-strip
    layouts (what encode_geotiff and common external writers emit)."""
    if blob[:4] != _II:
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tid, ttype, count, value = struct.unpack_from(
            "<HHII", blob, ifd_off + 2 + 12 * i)
        tags[tid] = (ttype, count, value)

    def shorts(tid):
        ttype, count, value = tags[tid]
        if count * 2 <= 4:
            return list(struct.unpack("<%dH" % count,
                                      value.to_bytes(4, "little")[:2 * count]))
        return list(struct.unpack_from("<%dH" % count, blob, value))

    def doubles(tid):
        _t, count, off = tags[tid]
        return list(struct.unpack_from("<%dd" % count, blob, off))

    w = tags[_W][2]
    h = tags[_H][2]
    # Declared limits, not silent garbage: a plain (non-geo) TIFF or a
    # multi-strip file from another writer must fail with a clear error —
    # the strip-offset value field would otherwise be misread as a data
    # offset and reshape noise.
    missing = [t for t in (_MODEL_SCALE, _MODEL_TIEPOINT, _GEO_KEYS)
               if t not in tags]
    if missing:
        raise NotImplementedError(
            "TIFF without GeoTIFF tags (ModelPixelScale/Tiepoint/GeoKeys) — "
            "plain TIFFs need an image library this environment lacks")
    samples = tags[_SAMPLES][2] if _SAMPLES in tags else 1
    bits = shorts(_BITS)[0]
    comp = tags[_COMP][2]
    if comp not in (1, 5, 8, 32773):
        raise NotImplementedError(
            "only uncompressed / LZW / Deflate / PackBits TIFF")
    # multi-strip (r5): concatenate RowsPerStrip-sized strips in order —
    # the layout most external writers emit (GDAL defaults to ~8 KB strips)
    offs = _tag_longs(blob, tags, _STRIP_OFF)
    cnts = _tag_longs(blob, tags, _STRIP_CNT)
    dt = np.uint8 if bits == 8 else np.dtype("<u2")
    parts = []
    for off, cnt in zip(offs, cnts):
        if comp == 8:
            import zlib

            raw = zlib.decompress(blob[off:off + cnt])
            parts.append(np.frombuffer(raw, dtype=dt))
        elif comp == 5:
            from imagery_utils_spark.sources.tiff_lzw import (
                tiff_lzw_decode)

            raw = tiff_lzw_decode(blob[off:off + cnt])
            parts.append(np.frombuffer(raw, dtype=dt))
        elif comp == 32773:
            from imagery_utils_spark.sources.packbits import (
                packbits_decode)

            # strips are whole rows; expected = rows_in_strip * row_bytes
            raw = packbits_decode(blob[off:off + cnt],
                                  h * w * samples * (bits // 8)
                                  // len(offs))
            parts.append(np.frombuffer(raw, dtype=dt))
        else:
            parts.append(np.frombuffer(blob, dtype=dt,
                                       count=cnt // (bits // 8), offset=off))
    arr = parts[0] if len(parts) == 1 else np.concatenate(parts)
    arr = arr.reshape((h, w) if samples == 1 else (h, w, samples))
    pred = tags[_PREDICTOR][2] if _PREDICTOR in tags else 1
    if pred == 2:
        # invert horizontal differencing: per-row cumulative sum mod
        # 2^bits (row-local, so strip boundaries never matter)
        wide = np.cumsum(arr.astype(np.int64), axis=1) % (1 << bits)
        arr = wide.astype(arr.dtype)
    elif pred != 1:
        raise NotImplementedError(f"TIFF predictor {pred} unsupported")

    px, py, _pz = doubles(_MODEL_SCALE)
    tp = doubles(_MODEL_TIEPOINT)
    xmin, ymax = tp[3] - tp[0] * px, tp[4] + tp[1] * py
    keys = shorts(_GEO_KEYS)
    epsg = 0
    for i in range(4, len(keys), 4):
        if keys[i] in (2048, 3072) and keys[i + 1] == 0:
            epsg = keys[i + 3]
    return arr.copy(), (xmin, px, 0.0, ymax, 0.0, -py), epsg
