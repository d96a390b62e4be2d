"""Plain-Python pins for Manacher vs brute palindrome census, PAV vs
the minimax isotonic characterization, and the Bresenham closed form
vs the stepwise error loop."""

import random
from fractions import Fraction


def _manacher(s):
    n = len(s)
    d1 = [0] * n
    lo, hi = 0, -1
    for i in range(n):
        k = 1 if i > hi else min(d1[lo + hi - i], hi - i + 1)
        while i - k >= 0 and i + k < n and s[i - k] == s[i + k]:
            k += 1
        d1[i] = k
        if i + k - 1 > hi:
            lo, hi = i - k + 1, i + k - 1
    d2 = [0] * n
    lo, hi = 0, -1
    for i in range(n):
        k = 0 if i > hi else min(d2[lo + hi - i + 1], hi - i + 1)
        while i - k - 1 >= 0 and i + k < n and s[i - k - 1] == s[i + k]:
            k += 1
        d2[i] = k
        if i + k - 1 > hi:
            lo, hi = i - k, i + k - 1
    return d1, d2


def test_manacher_vs_brute():
    rng = random.Random(6)
    for _ in range(40):
        s = "".join(rng.choice("abc") for _ in range(rng.randrange(1, 60)))
        d1, d2 = _manacher(s)
        mx = max(max(2 * x - 1 for x in d1),
                 max((2 * x for x in d2), default=0))
        cnt = sum(d1) + sum(d2)
        pals = [(i, j) for i in range(len(s)) for j in range(i + 1, len(s) + 1)
                if s[i:j] == s[i:j][::-1]]
        assert cnt == len(pals)
        assert mx == max(j - i for i, j in pals)


def test_pav_equals_minimax():
    rng = random.Random(17)
    for _ in range(30):
        ys = [rng.randrange(0, 50) for _ in range(rng.randrange(1, 15))]
        blocks = []
        for y in ys:
            blocks.append((y, 1))
            while len(blocks) >= 2 and \
                    blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]:
                s2, c2 = blocks.pop()
                s1, c1 = blocks.pop()
                blocks.append((s1 + s2, c1 + c2))
        pav = []
        for s, c in blocks:
            pav.extend([Fraction(s, c)] * c)
        n = len(ys)
        for i in range(n):
            mm = max(min(Fraction(sum(ys[a:b + 1]), b - a + 1)
                         for b in range(i, n))
                     for a in range(i + 1))
            assert pav[i] == mm, (ys, i)


def test_bresenham_closed_form():
    rng = random.Random(9)
    for _ in range(200):
        dx = rng.randrange(1, 250)
        dy = rng.randrange(1, dx + 1)
        y, err, ys = 0, 2 * dy - dx, [0]
        for _x in range(1, dx + 1):
            if err > 0:
                y += 1
                err += 2 * (dy - dx)
            else:
                err += 2 * dy
            ys.append(y)
        closed = [(2 * x * dy + dx - 1) // (2 * dx) for x in range(dx + 1)]
        assert ys == closed
