"""Plain-Python pins for the number-theory battery rows: Catalan
closed form equals Segner's recurrence, xor Gray equals reflection,
totient factorization equals the gcd census, and the Möbius
factorization view equals the Dirichlet-inverse recurrence."""

import math


def test_catalan_closed_form_equals_recurrence():
    cats = [1]
    for n in range(25):
        cats.append(sum(cats[i] * cats[n - i] for i in range(n + 1)))
    for n, c in enumerate(cats):
        assert math.comb(2 * n, n) // (n + 1) == c


def test_gray_xor_equals_reflection():
    seq = [0, 1]
    for k in range(1, 10):
        seq = seq + [v + (1 << k) for v in reversed(seq)]
    for n, g in enumerate(seq):
        assert g == n ^ (n >> 1)


def _phi_factor(n):
    m, phi, d = n, 1, 2
    while d * d <= m:
        if m % d == 0:
            pk = 1
            while m % d == 0:
                m //= d
                pk *= d
            phi *= (pk // d) * (d - 1)
        d += 1
    if m > 1:
        phi *= m - 1
    return phi


def test_totient_formula_equals_census():
    for n in range(1, 500):
        census = sum(1 for k in range(1, n + 1) if math.gcd(n, k) == 1)
        assert _phi_factor(n) == census, n


def test_mobius_factors_equal_dirichlet_inverse():
    N = 1000
    mu = [0, 1]
    for n in range(2, N + 1):
        mu.append(-sum(mu[d] for d in range(1, n) if n % d == 0))
    for n in range(1, N + 1):
        m, omega, sq = n, 0, False
        d = 2
        while d * d <= m:
            if m % d == 0:
                omega += 1
                cnt = 0
                while m % d == 0:
                    m //= d
                    cnt += 1
                sq = sq or cnt > 1
            d += 1
        if m > 1:
            omega += 1
        want = 0 if sq else (1 if omega % 2 == 0 else -1)
        assert mu[n] == want, n
