"""IMA/DVI ADPCM (the WAV format-0x11 codec) from the public spec.

4 bits per sample adaptive-differential PCM: each nibble encodes the
quantized difference to a running predictor, with a step size that
adapts through the canonical 89-entry table (IMA ADPCM reference /
Intel-DVI algorithm, as standardized in the IMA Digital Audio Focus
and Technical Working Groups recommendation, 1992 — the same tables
every implementation ships).

This closes part of the repo's declared "lossy AV payloads" limit next
to G.711 (functions/audio.py): G.711 is memoryless (pure column
algebra, SQL-oracle-able); ADPCM is STATEFUL per stream, so its Spark
shape is the multimodal one — opaque binary column + vectorized numpy
codec under mapInPandas (sources/multimodal.py pattern), one audio
blob per Arrow row, streams never split mid-blob.

Nibble packing: low nibble first within each byte (the WAV/IMA block
convention). State starts at predictor=0, index=0; WAV block headers
(predictor/index per block) are the caller's framing concern.

Vectorization note: the recurrence is genuinely sequential per stream
(predictor/index feed forward), so the numpy loop is per-sample within
a blob but blobs batch across the Arrow boundary — the parallel unit
at 100 TB is the stream, not the sample.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_ima", "decode_ima", "STEP_TABLE", "INDEX_TABLE"]

STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else 32767 if v > 32767 else v


def encode_ima(samples, predictor: int = 0, index: int = 0) -> bytes:
    """PCM16 -> packed 4-bit nibbles (low nibble first). An odd sample
    count leaves the final high nibble zero."""
    pred, idx = int(predictor), int(index)
    nibbles = []
    for s in np.asarray(samples, dtype=np.int64):
        step = STEP_TABLE[idx]
        diff = int(s) - pred
        sign = 8 if diff < 0 else 0
        if sign:
            diff = -diff
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        pred = _clamp16(pred - vpdiff if sign else pred + vpdiff)
        delta |= sign
        idx = min(88, max(0, idx + INDEX_TABLE[delta & 7]))
        nibbles.append(delta)
    out = bytearray((len(nibbles) + 1) // 2)
    for i, nib in enumerate(nibbles):
        if i % 2 == 0:
            out[i // 2] = nib
        else:
            out[i // 2] |= nib << 4
    return bytes(out)


def decode_ima(blob: bytes, n_samples: int, predictor: int = 0,
               index: int = 0) -> np.ndarray:
    """Packed nibbles -> PCM16 (int16 ndarray)."""
    if n_samples > 2 * len(blob):
        raise ValueError("blob too short for n_samples")
    pred, idx = int(predictor), int(index)
    out = np.empty(n_samples, dtype=np.int16)
    for i in range(n_samples):
        b = blob[i // 2]
        delta = (b >> 4) if i % 2 else (b & 0xF)
        step = STEP_TABLE[idx]
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        pred = _clamp16(pred - vpdiff if delta & 8 else pred + vpdiff)
        idx = min(88, max(0, idx + INDEX_TABLE[delta & 7]))
        out[i] = pred
    return out
