"""Number-theoretic transform (exact integer FFT) and NTT-based
circular convolution — the signal-processing kernel in its EXACT form:
all arithmetic in Z/p with p = 65537 (the Fermat prime F4), so the
convolution theorem holds with zero rounding error and results equal
plain integer convolution whenever values stay below p.

Public derivation: radix-2 decimation-in-time Cooley–Tukey exactly as
published, with the DFT's e^{-2πi/n} replaced by a primitive n-th root
of unity mod p (3 is a primitive root of 65537, so w_n = 3^(65536/n)).
The inverse transform uses w_n^{-1} and the n^{-1} mod p scale, per the
standard treatment (CLRS ch. 30 / Nussbaumer).

Pipeline use: exact sliding correlation of per-group histograms (the
convolution a⊛b) at 100-TB scale runs as applyInPandas per group —
each group's 64-point transform is O(n log n) local work after ONE
groupBy shuffle; nothing crosses groups. The battery row checks this
implementation against the direct-definition O(n²) convolution sum
computed relationally by the oracle — two entirely different
algorithms that must agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

P = 65537          # Fermat prime 2^16 + 1
G = 3              # primitive root mod P


def _pow_mod(b: int, e: int, m: int = P) -> int:
    return pow(b, e, m)


def ntt(a: np.ndarray, inverse: bool = False) -> np.ndarray:
    """In-place-style iterative radix-2 NTT of length-n (power of two,
    n | 2^16) int64 vector mod P. Returns a new array."""
    n = len(a)
    if n & (n - 1):
        raise ValueError("length must be a power of two")
    if (1 << 16) % n:
        raise ValueError("length must divide 2^16")
    v = np.array(a, dtype=np.int64) % P
    # bit-reversal permutation
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            v[i], v[j] = v[j], v[i]
    length = 2
    while length <= n:
        w_len = _pow_mod(G, (P - 1) // length)
        if inverse:
            w_len = _pow_mod(w_len, P - 2)
        half = length >> 1
        for start in range(0, n, length):
            w = 1
            for k in range(start, start + half):
                u = int(v[k])
                t = int(v[k + half]) * w % P
                v[k] = (u + t) % P
                v[k + half] = (u - t) % P
                w = w * w_len % P
        length <<= 1
    if inverse:
        n_inv = _pow_mod(n, P - 2)
        v = v * n_inv % P
    return v


def circular_convolve(a, b) -> np.ndarray:
    """Exact circular convolution via the convolution theorem in Z/p.
    Caller guarantees the true integer result < P (exactness bound)."""
    fa, fb = ntt(np.asarray(a)), ntt(np.asarray(b))
    return ntt(fa * fb % P, inverse=True)
