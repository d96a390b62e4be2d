"""Plain-Python pins: the RS generator constant is re-derived from
first principles (Π(x−αⁱ) over GF(256)/0x11D), peasant multiply ≡
log-table multiply, Hamming(7,4) syndrome decode ≡ nearest codeword,
and Zeckendorf greedy ≡ the unique non-adjacent subset."""

import random


def _tables():
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= 0x11D
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    return exp, log


def _mul(exp, log, a, b):
    if a == 0 or b == 0:
        return 0
    return exp[log[a] + log[b]]


def test_rs_generator_constant():
    from __spark_entry__ import _RS_GEN
    exp, log = _tables()
    g = [1]
    for i in range(8):
        ai = exp[i]
        ng = [0] * (len(g) + 1)
        for j, c in enumerate(g):
            ng[j] ^= _mul(exp, log, c, ai)
            ng[j + 1] ^= c
        g = ng
    assert g[::-1] == [1] + _RS_GEN


def test_peasant_mul_equals_log_mul():
    exp, log = _tables()

    def peasant(a, b):
        r = 0
        while b:
            if b & 1:
                r ^= a
            a <<= 1
            if a & 0x100:
                a ^= 0x11D
            b >>= 1
        return r

    rng = random.Random(3)
    for _ in range(500):
        a, b = rng.randrange(256), rng.randrange(256)
        assert peasant(a, b) == _mul(exp, log, a, b)


def _encode(d):
    d1, d2, d3, d4 = d & 1, (d >> 1) & 1, (d >> 2) & 1, (d >> 3) & 1
    p1, p2, p3 = (d1 + d2 + d4) % 2, (d1 + d3 + d4) % 2, (d2 + d3 + d4) % 2
    return p1 + p2 * 2 + d1 * 4 + p3 * 8 + d2 * 16 + d3 * 32 + d4 * 64


def test_hamming_syndrome_equals_nearest():
    book = {_encode(d): d for d in range(16)}
    assert len(book) == 16
    for d in range(16):
        for epos in range(1, 8):
            r = _encode(d) ^ (1 << (epos - 1))
            # nearest codeword
            near = min(book, key=lambda c: (bin(c ^ r).count("1"), book[c]))
            # syndrome
            s1 = sum((r >> p) & 1 for p in (0, 2, 4, 6)) % 2
            s2 = sum((r >> p) & 1 for p in (1, 2, 5, 6)) % 2
            s4 = sum((r >> p) & 1 for p in (3, 4, 5, 6)) % 2
            pos = s1 + 2 * s2 + 4 * s4
            fixed = r if pos == 0 else r ^ (1 << (pos - 1))
            dec = ((fixed >> 2) & 1) + ((fixed >> 4) & 1) * 2 \
                + ((fixed >> 5) & 1) * 4 + ((fixed >> 6) & 1) * 8
            assert pos == epos
            assert dec == d == book[near]


def test_zeckendorf_greedy_unique():
    fibs = []
    a, b = 1, 2
    for i in range(2, 26):
        fibs.append((i, a))
        a, b = b, a + b
    rng = random.Random(5)
    for _ in range(60):
        x = rng.randrange(1, 100001)
        rem, mask = x, 0
        for i, v in sorted(fibs, key=lambda t: -t[1]):
            if rem >= v:
                mask |= 1 << (i - 2)
                rem -= v
        assert rem == 0
        # non-adjacency
        assert mask & (mask << 1) == 0
        # sum check
        assert sum(v for i, v in fibs if mask >> (i - 2) & 1) == x
