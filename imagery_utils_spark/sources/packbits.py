"""PackBits (TIFF compression 32773, the Apple RLE from the TIFF 6.0
spec §9): literal runs (header 0..127 = n-1 literal bytes) and repeat
runs (header -127..-1 two's-complement = 2..128 copies), -128 is a
noop. TIFF convention: each ROW is packed separately and the packed
rows concatenate into the strip — a decoder that just inflates to the
expected byte count reads both forms.
"""

from __future__ import annotations

__all__ = ["packbits_encode", "packbits_decode"]


def _pack_row(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length of identical bytes at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)        # -(run-1) two's complement
            out.append(row[i])
            i = j
            continue
        # literal: until the next >=3 repeat (2-runs aren't worth
        # breaking a literal for, per the spec's recommendation)
        lit = i
        while i < n and i - lit < 128:
            if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                break
            i += 1
        out.append(i - lit - 1)
        out += row[lit:i]
    return bytes(out)


def packbits_encode(data: bytes, row_bytes: int | None = None) -> bytes:
    """Pack ``data``; with ``row_bytes`` each row packs separately
    (the TIFF convention — runs never cross row boundaries)."""
    if row_bytes is None:
        return _pack_row(data)
    if len(data) % row_bytes:
        raise ValueError("data not a whole number of rows")
    return b"".join(_pack_row(data[i:i + row_bytes])
                    for i in range(0, len(data), row_bytes))


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("packbits stream truncated")
        h = data[i]
        i += 1
        if h == 128:                      # noop
            continue
        if h < 128:                       # h+1 literal bytes
            if i + h + 1 > n:
                raise ValueError("packbits literal overruns stream")
            out += data[i:i + h + 1]
            i += h + 1
        else:                             # 257-h copies of next byte
            if i >= n:
                raise ValueError("packbits run overruns stream")
            out += bytes([data[i]]) * (257 - h)
            i += 1
    if len(out) != expected:
        raise ValueError("packbits output overshoots expected size")
    return bytes(out)
