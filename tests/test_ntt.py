"""NTT (operators/ntt.py) vs direct-definition DFT-in-Z/p and naive
convolution — two independent derivations of the same algebra."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imagery_utils_spark.operators.ntt import P, G, circular_convolve, ntt


def direct_ntt(a, inverse=False):
    """O(n^2) straight-from-definition transform: X[k] = sum a[j] w^{jk}."""
    n = len(a)
    w = pow(G, (P - 1) // n, P)
    if inverse:
        w = pow(w, P - 2, P)
    out = []
    for k in range(n):
        s = 0
        for j in range(n):
            s = (s + int(a[j]) * pow(w, j * k, P)) % P
        out.append(s)
    if inverse:
        ninv = pow(n, P - 2, P)
        out = [x * ninv % P for x in out]
    return np.array(out, dtype=np.int64)


def naive_circular(a, b):
    n = len(a)
    return np.array([sum(int(a[j]) * int(b[(k - j) % n]) for j in range(n))
                     for k in range(n)], dtype=np.int64)


def test_matches_direct_definition():
    a = np.array([(i * 7 + 3) % 100 for i in range(16)], dtype=np.int64)
    assert (ntt(a) == direct_ntt(a)).all()
    assert (ntt(a, inverse=True) == direct_ntt(a, inverse=True)).all()


def test_roundtrip_identity():
    a = np.array([(i * i + 5) % P for i in range(64)], dtype=np.int64)
    assert (ntt(ntt(a), inverse=True) == a).all()


def test_convolution_equals_naive():
    a = np.array([i % 9 for i in range(64)], dtype=np.int64)
    b = np.array([(j * j + 1) % 5 if j < 8 else 0 for j in range(64)],
                 dtype=np.int64)
    want = naive_circular(a, b)
    assert want.max() < P  # exactness bound holds for this profile
    assert (circular_convolve(a, b) == want).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 9), min_size=32, max_size=32),
       st.lists(st.integers(0, 4), min_size=32, max_size=32))
def test_convolution_property(xs, ys):
    a = np.array(xs, dtype=np.int64)
    b = np.array(ys, dtype=np.int64)
    want = naive_circular(a, b)
    assert want.max() < P
    assert (circular_convolve(a, b) == want).all()


def test_rejects_bad_lengths():
    with pytest.raises(ValueError):
        ntt(np.zeros(12, dtype=np.int64))
