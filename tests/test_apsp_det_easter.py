"""Plain-Python pins: min-plus squaring equals Floyd–Warshall,
Bareiss equals the Leibniz permutation sum, and Gauss's Easter
algorithm equals Butcher's over six centuries (plus known dates)."""

import itertools
import random

INF = 10 ** 9


def test_minplus_squaring_equals_floyd_warshall():
    rng = random.Random(14)
    for _ in range(10):
        V = 12
        d = [[0 if i == j else INF for j in range(V)] for i in range(V)]
        for u in range(V):
            d[u][(u + 1) % V] = min(d[u][(u + 1) % V], rng.randrange(1, 100))
            v = rng.randrange(V)
            if v != u:
                d[u][v] = min(d[u][v], rng.randrange(1, 100))
        fw = [row[:] for row in d]
        for k in range(V):
            for i in range(V):
                for j in range(V):
                    fw[i][j] = min(fw[i][j], fw[i][k] + fw[k][j])
        sq = [row[:] for row in d]
        for _r in range(4):  # 2^4 >= V-1 hops
            sq = [[min(sq[i][j], min(sq[i][m] + sq[m][j]
                                     for m in range(V)))
                   for j in range(V)] for i in range(V)]
        assert sq == fw


def test_bareiss_equals_leibniz():
    rng = random.Random(3)
    for _ in range(30):
        n = 5
        a = [[rng.randrange(-9, 10) for _ in range(n)] for _ in range(n)]
        leib = 0
        for pm in itertools.permutations(range(n)):
            inv = sum(1 for i in range(n) for j in range(i + 1, n)
                      if pm[i] > pm[j])
            t = 1
            for r in range(n):
                t *= a[r][pm[r]]
            leib += (-1) ** inv * t
        b = [row[:] for row in a]
        sign, prev = 1, 1
        det = None
        for k in range(n - 1):
            if b[k][k] == 0:
                for i in range(k + 1, n):
                    if b[i][k] != 0:
                        b[k], b[i] = b[i], b[k]
                        sign = -sign
                        break
                else:
                    det = 0
                    break
            for i in range(k + 1, n):
                for j in range(k + 1, n):
                    num = b[i][j] * b[k][k] - b[i][k] * b[k][j]
                    assert num % prev == 0
                    b[i][j] = num // prev
                b[i][k] = 0
            prev = b[k][k]
        if det is None:
            det = sign * b[n - 1][n - 1]
        assert det == leib


def _gauss_easter(year):
    a, b, c = year % 19, year % 4, year % 7
    k = year // 100
    p = (13 + 8 * k) // 25
    q = k // 4
    m = (15 - p + k - q) % 30
    n = (4 + k - q) % 7
    d = (19 * a + m) % 30
    e = (2 * b + 4 * c + 6 * d + n) % 7
    if d == 29 and e == 6:
        return 4, 19
    if d == 28 and e == 6 and (11 * m + 11) % 30 < 19:
        return 4, 18
    off = d + e
    return (3, 22 + off) if off <= 9 else (4, off - 9)


def _butcher_easter(y):
    a, b, c = y % 19, y // 100, y % 100
    d, e = b // 4, b % 4
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = c // 4, c % 4
    ll = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * ll) // 451
    return (h + ll - 7 * m + 114) // 31, ((h + ll - 7 * m + 114) % 31) + 1


def test_gauss_equals_butcher_and_known_dates():
    for y in range(1700, 2500):
        assert _gauss_easter(y) == _butcher_easter(y), y
    known = {2024: (3, 31), 2025: (4, 20), 2026: (4, 5), 2000: (4, 23),
             1981: (4, 19), 1954: (4, 18), 2049: (4, 18), 2011: (4, 24)}
    for y, md in known.items():
        assert _butcher_easter(y) == md, y
