"""GIF87a codec tests — LZW width/clear boundaries, KwKwK, container
structure, and hypothesis roundtrips."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imagery_utils_spark.sources.gif import (
    _lzw_decode, _lzw_encode, decode_gif, encode_gif)


def test_lzw_width_growth_and_dict_full_clear():
    """Repetitive data marches the dictionary through every width
    transition (512/1024/2048) and the 4096 ceiling's CLEAR+restart."""
    data = bytes((np.arange(60000) % 7).astype(np.uint8))
    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data
    data = bytes(np.random.RandomState(0).randint(
        0, 256, 60000).astype(np.uint8))
    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data


def test_lzw_kwkwk():
    data = b"\x01\x02" * 300 + b"\x01\x01\x01\x01"
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data


def test_lzw_truncation_rejected():
    enc = _lzw_encode(b"\x00\x01\x02\x03" * 10, 2)
    with pytest.raises(ValueError):
        _lzw_decode(enc[:3], 2, 40)


def test_container_roundtrip_and_small_palette():
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 5, (9, 9)).astype(np.uint8)
    pal = rng.randint(0, 256, (5, 3)).astype(np.uint8)
    i2, p2 = decode_gif(encode_gif(idx, pal))
    assert (i2 == idx).all()
    assert (p2[:5] == pal).all()
    assert p2.shape[0] == 8  # padded to the power-of-two table size


def test_container_structure_checks():
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 256, (4, 4)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    b = encode_gif(idx, pal)
    assert b[:6] == b"GIF87a" and b[-1] == 0x3B
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b[6:])   # 87a-only profile
    with pytest.raises(ValueError):
        decode_gif(b[:-1])              # missing trailer
    with pytest.raises(ValueError):
        encode_gif(np.full((2, 2), 7, np.uint8),
                   pal[:4])             # index out of palette


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 20), h=st.integers(1, 20),
       ncol=st.integers(2, 256), seed=st.integers(0, 2**31 - 1))
def test_property_roundtrip(w, h, ncol, seed):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, ncol, (h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    i2, p2 = decode_gif(encode_gif(idx, pal))
    assert (i2 == idx).all() and (p2[:ncol] == pal).all()


def test_tail_boundary_fuzz():
    """Regression for the hypothesis-found tail desync (decoder widens
    before EOI when its last add lands on 2^width; encoder width must
    mirror the decoder's add-per-code accounting)."""
    import random
    rng = random.Random(7)
    for _ in range(3000):
        mcs = rng.choice([2, 3, 4, 8])
        n = rng.randint(0, 60)
        d = bytes(rng.randint(0, (1 << mcs) - 1) for _ in range(n))
        assert _lzw_decode(_lzw_encode(d, mcs), mcs, len(d)) == d


# --------------------------------------------------------------- GIF89a
import numpy as _np

from imagery_utils_spark.sources.gif import (decode_gif_frames,
                                             encode_gif89a)


def _pal(n=8):
    return _np.array([[i * 31 % 256, i * 17 % 256, i * 7 % 256]
                      for i in range(n)], dtype=_np.uint8)


def test_gif89a_animation_roundtrip():
    rng = _np.random.RandomState(5)
    frames = [rng.randint(0, 8, (13, 21)).astype(_np.uint8)
              for _ in range(4)]
    blob = encode_gif89a(frames, _pal(), delay_cs=7, loop=3,
                         transparent=2)
    pal, out = decode_gif_frames(blob)
    assert len(out) == 4
    assert (pal[:8] == _pal()).all()
    for a, b in zip(frames, out):
        assert (b["indices"] == a).all()
        assert b["delay_cs"] == 7
        assert b["transparent"] == 2


def test_gif89a_reader_accepts_87a_single_frame():
    from imagery_utils_spark.sources.gif import encode_gif

    idx = (_np.arange(35, dtype=_np.uint8) % 8).reshape(5, 7)
    pal, out = decode_gif_frames(encode_gif(idx, _pal()))
    assert len(out) == 1
    assert (out[0]["indices"] == idx).all()
    assert out[0]["transparent"] is None


def test_gif89a_skips_foreign_extensions():
    idx = _np.zeros((3, 3), dtype=_np.uint8)
    blob = bytearray(encode_gif89a([idx], _pal(2)))
    # splice a comment extension before the first GCE (after GCT)
    insert_at = 13 + 2 * 3
    comment = bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    blob[insert_at:insert_at] = comment
    pal, out = decode_gif_frames(bytes(blob))
    assert len(out) == 1 and (out[0]["indices"] == idx).all()


def test_gif89a_rejects_partial_frames():
    import struct as _struct

    idx = _np.zeros((4, 4), dtype=_np.uint8)
    blob = bytearray(encode_gif89a([idx], _pal(2)))
    i = blob.index(0x2C, 13)  # first image descriptor
    # shrink the frame to 2x2 at (1,1): now partial-canvas
    blob[i + 1:i + 9] = _struct.pack("<HHHH", 1, 1, 2, 2)
    import pytest as _pytest
    with _pytest.raises((NotImplementedError, ValueError)):
        decode_gif_frames(bytes(blob))


# ------------------------------------------- partial-canvas composition

def test_compose_disposal_none_paints_over():
    """Disposal 0/1: later frames paint over a persistent canvas —
    expected canvases are hand literals, not a replay."""
    import numpy as np

    from imagery_utils_spark.sources.gif import (
        compose_gif, encode_gif89a_anim)

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    base = np.zeros((4, 4), dtype=np.uint8)
    patch = np.full((2, 2), 2, dtype=np.uint8)
    blob = encode_gif89a_anim(
        [{"indices": base, "disposal": 1},
         {"indices": patch, "left": 1, "top": 2, "disposal": 1},
         {"indices": np.full((1, 1), 3, dtype=np.uint8),
          "left": 3, "top": 0, "disposal": 0}], pal)
    _, out = compose_gif(blob)
    assert len(out) == 3
    want1 = np.zeros((4, 4), dtype=np.uint8)
    want1[2:4, 1:3] = 2
    assert (out[1] == want1).all()
    want2 = want1.copy()
    want2[0, 3] = 3          # persists OVER the previous canvas
    assert (out[2] == want2).all()


def test_compose_disposal_background_clears_rect():
    import numpy as np

    from imagery_utils_spark.sources.gif import (
        compose_gif, encode_gif89a_anim)

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]],
                   dtype=np.uint8)
    base = np.full((3, 3), 1, dtype=np.uint8)
    blob = encode_gif89a_anim(
        [{"indices": base, "disposal": 0},
         # disposal 2: after display, rect restored to BACKGROUND (3)
         {"indices": np.full((2, 2), 2, dtype=np.uint8),
          "left": 0, "top": 0, "disposal": 2},
         {"indices": np.full((1, 1), 1, dtype=np.uint8),
          "left": 2, "top": 2, "disposal": 0}],
        pal, background=3)
    _, out = compose_gif(blob)
    want_f1 = np.full((3, 3), 1, dtype=np.uint8)
    want_f1[0:2, 0:2] = 2
    assert (out[1] == want_f1).all()
    want_f2 = np.full((3, 3), 1, dtype=np.uint8)
    want_f2[0:2, 0:2] = 3    # cleared to background, NOT frame 0 pixels
    assert (out[2] == want_f2).all()


def test_compose_disposal_previous_restores():
    import numpy as np

    from imagery_utils_spark.sources.gif import (
        compose_gif, encode_gif89a_anim)

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    base = np.arange(16, dtype=np.uint8).reshape(4, 4) % 4
    blob = encode_gif89a_anim(
        [{"indices": base, "disposal": 0},
         # disposal 3: after display, canvas reverts to pre-frame state
         {"indices": np.full((2, 3), 1, dtype=np.uint8),
          "left": 1, "top": 1, "disposal": 3},
         {"indices": np.full((1, 1), 2, dtype=np.uint8),
          "left": 0, "top": 0, "disposal": 0}], pal)
    _, out = compose_gif(blob)
    shown1 = base.copy()
    shown1[1:3, 1:4] = 1
    assert (out[1] == shown1).all()
    want2 = base.copy()      # frame 1's paint is GONE (restored)
    want2[0, 0] = 2
    assert (out[2] == want2).all()


def test_compose_transparent_pixels_preserve_underlying():
    import numpy as np

    from imagery_utils_spark.sources.gif import (
        compose_gif, encode_gif89a_anim)

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [7, 7, 7]],
                   dtype=np.uint8)
    base = np.full((2, 4), 1, dtype=np.uint8)
    patch = np.array([[3, 2, 3, 2]], dtype=np.uint8)  # 3 = transparent
    blob = encode_gif89a_anim(
        [{"indices": base, "disposal": 0},
         {"indices": patch, "left": 0, "top": 1, "transparent": 3,
          "disposal": 0}], pal)
    _, out = compose_gif(blob)
    want = base.copy()
    want[1] = [1, 2, 1, 2]   # transparent slots keep the base pixel
    assert (out[1] == want).all()


def test_compose_full_canvas_equals_raw_frames():
    """Full-canvas opaque frames: composition must be the identity."""
    import numpy as np

    from imagery_utils_spark.sources.gif import (
        compose_gif, decode_gif_frames, encode_gif89a)

    rng = [(i * 37 + j * 11) % 4 for i in range(5) for j in range(6)]
    f0 = np.array(rng, dtype=np.uint8).reshape(5, 6)
    f1 = (f0 + 1) % 4
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170],
                    [255, 255, 255]], dtype=np.uint8)
    blob = encode_gif89a([f0, f1], pal)
    _, composed = compose_gif(blob)
    _, raw = decode_gif_frames(blob)
    assert (composed[0] == raw[0]["indices"]).all()
    assert (composed[1] == raw[1]["indices"]).all()
