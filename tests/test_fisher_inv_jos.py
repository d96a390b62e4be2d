"""Plain-Python pins: multiplicative binomial fold (with its exact
stepwise divisions) equals math.comb, Fisher two-sided p as exact
rational equals the definition, merge-sort inversions equal the O(n²)
count, and the Josephus bit closed form equals the recurrence."""

import math
import random
from fractions import Fraction


def _choose_fold(n, k):
    acc = 1
    for i in range(1, k + 1):
        q = (acc * (n - i + 1)) / i  # double division, must be exact
        assert q == int(q)
        acc = int(q)
    return acc


def test_choose_fold_exact():
    for n in range(0, 41):
        for k in range(0, n + 1):
            assert _choose_fold(n, k) == math.comb(n, k)


def test_fisher_exact_rational():
    rng = random.Random(12)
    for _ in range(30):
        nn = 40
        kk = rng.randrange(10, 31)
        n = rng.randrange(10, 31)
        lo, hi = max(0, kk + n - nn), min(kk, n)
        k_obs = rng.randrange(lo, hi + 1)
        ws = {k: math.comb(kk, k) * math.comb(nn - kk, n - k)
              for k in range(lo, hi + 1)}
        p_num = sum(w for w in ws.values() if w <= ws[k_obs])
        p_den = sum(ws.values())
        assert p_den == math.comb(nn, n)  # Vandermonde
        p = Fraction(p_num, p_den)
        assert 0 < p <= 1


def test_inversions_merge_vs_brute():
    rng = random.Random(30)

    def rec(a):
        if len(a) <= 1:
            return a, 0
        m = len(a) // 2
        left, il = rec(a[:m])
        right, ir = rec(a[m:])
        merged, i, j, inv = [], 0, 0, il + ir
        while i < len(left) and j < len(right):
            if right[j] < left[i]:
                merged.append(right[j])
                j += 1
                inv += len(left) - i
            else:
                merged.append(left[i])
                i += 1
        merged.extend(left[i:])
        merged.extend(right[j:])
        return merged, inv

    for _ in range(40):
        a = [rng.randrange(0, 20) for _ in range(rng.randrange(0, 60))]
        brute = sum(1 for i in range(len(a)) for j in range(i + 1, len(a))
                    if a[i] > a[j])
        assert rec(a)[1] == brute


def test_josephus_closed_form():
    for n in range(1, 3000):
        s = 0
        for m in range(2, n + 1):
            s = (s + 2) % m
        p = n
        for sh in (1, 2, 4, 8):
            p |= p >> sh
        hp = (p + 1) >> 1
        assert 2 * (n - hp) == s
