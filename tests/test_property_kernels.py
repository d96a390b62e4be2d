"""Property-based hardening for the round-4 kernels: the engine and its
independent oracle implementations must agree on ARBITRARY dyadic inputs,
not just the battery fixtures; the JPEG codec must roundtrip any image
within a PSNR floor and never crash on valid input."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import independent_oracles as IO
from imagery_utils_spark.core.geom import wrap_geometry_180
from imagery_utils_spark.operators.footprint import _dp_simplify

# dyadic coordinates: i / 4 over a modest integer range keeps every cross
# product / interpolation exact in float64
dyadic = st.integers(-2000, 2000).map(lambda i: i / 4.0)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(dyadic, dyadic), min_size=3, max_size=40),
       st.sampled_from([0.25, 0.5, 1.0, 2.0]))
def test_dp_simplify_engine_equals_recursive_oracle(pts, tol):
    kept_engine = [tuple(p) for p in _dp_simplify(np.asarray(pts, float), tol)]
    kept_oracle = [pts[i] for i in IO._dp_recursive(pts, tol)]
    assert kept_engine == kept_oracle


def _crossing_ring(x_w, ys):
    """Alternate one west (positive, near 180) and one east longitude whose
    shifted x-run is EXACTLY 64 (power of two) so every crossing
    interpolation is float-exact; ys vary freely (dyadic)."""
    x_e = x_w - 296.0  # shifted: x_w + 64
    return [(x_w if i % 2 == 0 else x_e, y) for i, y in enumerate(ys)]


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, 15).map(lambda i: 128.0 + 4 * i),
    st.lists(st.integers(-256, 256).map(lambda i: i / 4.0), min_size=4,
             max_size=10),
)
def test_wrap_engine_equals_fraction_oracle_exact(x_w, ys):
    """Power-of-two runs: the engine's float wrap must be BIT-identical to
    the exact-rational oracle."""
    ring = _crossing_ring(x_w, ys)
    try:
        oracle = IO._wrap_exact(ring)
    except ZeroDivisionError:
        return
    engine = [p.tolist() for p in wrap_geometry_180(np.asarray(ring, float))]
    assert engine == [[list(pt) for pt in part] for part in oracle]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 12).map(lambda i: 124.0 + 4 * i), min_size=1,
             max_size=4),
    st.lists(st.integers(0, 12).map(lambda i: -172.0 + 4 * i), min_size=1,
             max_size=4),
    st.lists(st.integers(-64, 64).map(float), min_size=4, max_size=10),
)
def test_wrap_engine_matches_fraction_oracle_approx(xs_west, xs_east, ys):
    """Arbitrary (non-power-of-two) runs: same structure and vertex order,
    crossings within 1e-9 of the exact-rational value."""
    ring = []
    for i, y in enumerate(ys):
        x = xs_west[i % len(xs_west)] if i % 2 == 0 else xs_east[i % len(xs_east)]
        ring.append((x, y))
    try:
        oracle = IO._wrap_exact(ring)
    except ZeroDivisionError:
        return
    engine = wrap_geometry_180(np.asarray(ring, float))
    assert len(engine) == len(oracle)
    for ep, op in zip(engine, oracle):
        assert len(ep) == len(op)
        for (ex, ey), (ox, oy) in zip(ep.tolist(), op):
            assert ex == ox and abs(ey - oy) < 1e-9


@settings(max_examples=25, deadline=None)
@given(st.integers(12, 40), st.integers(12, 40), st.integers(0, 10 ** 6),
       st.sampled_from([70, 85, 95]), st.booleans())
def test_jpeg_roundtrip_psnr_floor(w, h, seed, quality, subsample):
    from imagery_utils_spark.sources.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    # low-frequency content (random control points upsampled) — JPEG's
    # design regime; PSNR floors are meaningful here, unlike white noise
    small = rng.integers(0, 256, size=(4, 4, 3)).astype(np.float64)
    yi = np.linspace(0, 3, h)
    xi = np.linspace(0, 3, w)
    y0 = np.floor(yi).astype(int); fy = (yi - y0)[:, None, None]
    x0 = np.floor(xi).astype(int); fx = (xi - x0)[None, :, None]
    y1 = np.minimum(y0 + 1, 3); x1 = np.minimum(x0 + 1, 3)
    img = ((small[y0][:, x0] * (1 - fy) * (1 - fx))
           + small[y1][:, x0] * fy * (1 - fx)
           + small[y0][:, x1] * (1 - fy) * fx
           + small[y1][:, x1] * fy * fx)  # true bilinear: low-frequency
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert dec.shape == img.shape
    mse = np.mean((img.astype(float) - dec.astype(float)) ** 2)
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 22.0, (w, h, seed, quality, subsample, psnr)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 10 ** 6),
       st.sampled_from([1, 3, 4]))
def test_png_roundtrip_exact(w, h, seed, channels):
    from imagery_utils_spark.sources.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, channels)).astype(np.uint8)
    if channels == 1:
        arr = arr[:, :, 0]
    assert (decode_png(encode_png(arr)) == arr).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 10 ** 6))
def test_bmp_ppm_roundtrip_exact(w, h, seed):
    from imagery_utils_spark.sources.multimodal import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm)

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert (decode_bmp(encode_bmp(arr)) == arr).all()
    assert (decode_ppm(encode_ppm(arr)) == arr).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 2000), st.integers(1, 4), st.integers(0, 10 ** 6),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_exact(n, channels, seed, rate):
    from imagery_utils_spark.sources.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=(n, channels)).astype(np.int16)
    back, r = decode_wav(encode_wav(samples, rate))
    assert r == rate and (back == samples).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 30), st.integers(1, 30), st.integers(0, 10 ** 6),
       st.sampled_from([None, "deflate"]), st.booleans())
def test_geotiff_roundtrip_exact(w, h, seed, compress, sixteen):
    from imagery_utils_spark.sources.geotiff import decode_geotiff, encode_geotiff

    rng = np.random.default_rng(seed)
    if sixteen:
        arr = rng.integers(0, 65536, size=(h, w)).astype(np.uint16)
    else:
        arr = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    out, gtf, epsg = decode_geotiff(
        encode_geotiff(arr, 0.0, 0.0, float(w), float(h), epsg=3413,
                       compress=compress))
    assert (out == arr).all() and epsg == 3413
    assert gtf[1] == 1.0 and gtf[5] == -1.0
