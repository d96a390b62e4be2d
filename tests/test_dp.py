"""DTW + Viterbi kernels (operators/dp.py) vs independent derivations:
memoized-recursive DTW and exhaustive path enumeration."""

import itertools
from functools import lru_cache

from hypothesis import given, settings
from hypothesis import strategies as st

from imagery_utils_spark.operators.dp import dtw_distance, viterbi_best


def dtw_recursive(a, b):
    """Independent formulation: top-down memoized recursion."""
    @lru_cache(maxsize=None)
    def d(i, j):
        if i == 0 and j == 0:
            return abs(a[0] - b[0])
        opts = []
        if i > 0:
            opts.append(d(i - 1, j))
        if j > 0:
            opts.append(d(i, j - 1))
        if i > 0 and j > 0:
            opts.append(d(i - 1, j - 1))
        return abs(a[i] - b[j]) + min(opts)

    return d(len(a) - 1, len(b) - 1)


def viterbi_brute(obs, start, trans, emit):
    ns = len(start)
    best, cnt = None, 0
    for path in itertools.product(range(ns), repeat=len(obs)):
        sc = start[path[0]] + emit[path[0]][obs[0]]
        for t in range(1, len(obs)):
            sc += trans[path[t - 1]][path[t]] + emit[path[t]][obs[t]]
        if best is None or sc > best:
            best, cnt = sc, 1
        elif sc == best:
            cnt += 1
    return best, cnt


def test_dtw_hand_example():
    # identical series -> 0; constant shift of a flat series -> n*shift
    assert dtw_distance([1, 2, 3], [1, 2, 3]) == 0
    assert dtw_distance([5, 5, 5], [7, 7, 7]) == 6
    # classic elasticity: a stretched copy matches at zero cost
    assert dtw_distance([1, 2, 3], [1, 1, 2, 2, 3, 3]) == 0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 20), min_size=1, max_size=8),
       st.lists(st.integers(0, 20), min_size=1, max_size=8))
def test_dtw_matches_recursive(a, b):
    assert dtw_distance(a, b) == dtw_recursive(tuple(a), tuple(b))


START = [0, -2]
TRANS = [[0, -3], [-4, 0]]
EMIT = [[0, -5, -1], [-6, 0, -1]]


def test_viterbi_hand_example():
    best, cnt = viterbi_best([0, 1, 0], START, TRANS, EMIT)
    assert (best, cnt) == viterbi_brute([0, 1, 0], START, TRANS, EMIT)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2), min_size=1, max_size=9))
def test_viterbi_matches_brute_force(obs):
    assert viterbi_best(obs, START, TRANS, EMIT) == \
        viterbi_brute(obs, START, TRANS, EMIT)


def test_viterbi_counts_ties():
    # symmetric scores: both states equally good at every step
    s = [0, 0]
    t = [[0, 0], [0, 0]]
    e = [[0], [0]]
    best, cnt = viterbi_best([0, 0, 0], s, t, e)
    assert best == 0 and cnt == 8  # all 2^3 paths optimal


# -------------------------------------------------------------- BWT

def test_bwt_classic_vector():
    from imagery_utils_spark.operators.bwt import bwt_forward, bwt_inverse

    assert bwt_forward("banana") == "annb\x01aa"
    assert bwt_inverse("annb\x01aa") == "banana"


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcde ", max_size=24))
def test_bwt_roundtrip_and_suffix_array_identity(s):
    from imagery_utils_spark.operators.bwt import bwt_forward, bwt_inverse

    b = bwt_forward(s)
    assert bwt_inverse(b) == s
    t = s + "\x01"
    sa = sorted(range(len(t)), key=lambda i: t[i:])
    assert b == "".join(t[(i - 1) % len(t)] for i in sa)


# ----------------------------------------------------- Aho-Corasick

def test_aho_corasick_vs_naive_scan():
    import re

    from imagery_utils_spark.operators.aho import (
        build_automaton, count_matches)

    pats = ["the", "and", "ing", "ion", "ent", "he"]
    a = build_automaton(pats)
    texts = ["the theory and the thing", "mention intention",
             "entanglement entente", "xyz", "hehehe the and"]
    for t in texts:
        got = count_matches(t, a, len(pats))
        # independent: all-occurrence count via lookahead regex
        want = [len(re.findall(f"(?={re.escape(p)})", t)) for p in pats]
        assert got == want, (t, got, want)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="theandiogn ", max_size=60))
def test_aho_corasick_property(t):
    import re

    from imagery_utils_spark.operators.aho import (
        build_automaton, count_matches)

    pats = ["the", "and", "ing", "ion", "ent", "he", "an"]
    a = build_automaton(pats)
    got = count_matches(t, a, len(pats))
    want = [len(re.findall(f"(?={re.escape(p)})", t)) for p in pats]
    assert got == want


# ----------------------------------------------------- Jenks breaks

def jenks_brute(values, k):
    """Exhaustive enumeration of all contiguous k-partitions."""
    xs = sorted(values)
    n = len(xs)

    def cost(seg):
        c = len(seg)
        s = sum(seg)
        q = sum(x * x for x in seg)
        return c * q - s * s

    best, cnt = None, 0
    for cuts in itertools.combinations(range(1, n), k - 1):
        bounds = [0] + list(cuts) + [n]
        tot = sum(cost(xs[bounds[i]:bounds[i + 1]])
                  for i in range(k))
        if best is None or tot < best:
            best, cnt = tot, 1
        elif tot == best:
            cnt += 1
    return best, cnt


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=4, max_size=10),
       st.integers(2, 4))
def test_jenks_matches_brute_force(xs, k):
    from imagery_utils_spark.operators.dp import jenks_cost

    if k > len(xs):
        k = len(xs)
    assert jenks_cost(xs, k) == jenks_brute(xs, k)


def test_jenks_hand_example():
    from imagery_utils_spark.operators.dp import jenks_cost

    # two tight clusters + k=2 -> split between them, cost = sum of
    # within-cluster count*SSD: [1,2] -> 2*5-9=1, [10,11] -> 2*221-441=1
    assert jenks_cost([1, 2, 10, 11], 2) == (2, 1)
    # k = n -> every class a singleton, zero cost, one way
    assert jenks_cost([5, 1, 9], 3) == (0, 1)


# --------------------------------------------------- convex hull

def jarvis_hull(points):
    """Independent gift-wrapping construction (different algorithm)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    hull = []
    start = min(pts)
    p = start
    while True:
        hull.append(p)
        q = pts[0] if pts[0] != p else pts[1]
        for r in pts:
            if r == p:
                continue
            c = cross(p, q, r)
            if c < 0 or (c == 0 and
                         (abs(r[0] - p[0]) + abs(r[1] - p[1])) >
                         (abs(q[0] - p[0]) + abs(q[1] - p[1]))):
                q = r
        p = q
        if p == start:
            break
    return hull


def hull_canon(h):
    """Rotate a CCW/CW vertex cycle to a canonical form for compare."""
    if len(h) <= 2:
        return sorted(h)
    i = h.index(min(h))
    r = h[i:] + h[:i]
    # jarvis walks clockwise with cross<0 preference; normalize both
    # orders by trying forward and reversed
    r2 = [r[0]] + list(reversed(r[1:]))
    return min(r, r2)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=20))
def test_convex_hull_matches_jarvis(pts):
    from imagery_utils_spark.operators.dp import convex_hull

    got = convex_hull(pts)
    want = jarvis_hull(pts)
    assert hull_canon(got) == hull_canon(want)


def test_convex_hull_square_with_interior():
    from imagery_utils_spark.operators.dp import convex_hull

    pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 3), (2, 0)]
    got = convex_hull(pts)
    assert sorted(got) == [(0, 0), (0, 4), (4, 0), (4, 4)]


# --------------------------------------------------- stable matching

def all_stable_matchings(prop_prefs, acc_prefs):
    n = len(prop_prefs)
    prank = [[0] * n for _ in range(n)]
    for p in range(n):
        for r, a in enumerate(prop_prefs[p]):
            prank[p][a] = r
    arank = [[0] * n for _ in range(n)]
    for a in range(n):
        for r, p in enumerate(acc_prefs[a]):
            arank[a][p] = r
    out = []
    for perm in itertools.permutations(range(n)):
        stable = True
        for p in range(n):
            for a in range(n):
                if perm[p] == a:
                    continue
                if prank[p][a] < prank[p][perm[p]] and \
                        arank[a][p] < arank[a][perm.index(a)]:
                    stable = False
                    break
            if not stable:
                break
        if stable:
            out.append(list(perm))
    return out


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10 ** 9))
def test_gale_shapley_is_proposer_optimal(seed):
    import hashlib

    from imagery_utils_spark.operators.dp import gale_shapley

    n = 5

    def prefs(tag, i):
        h = hashlib.sha256(f"{tag}:{seed}:{i}".encode()).digest()
        order = sorted(range(n), key=lambda j: (h[j], j))
        return order

    pp = [prefs("p", i) for i in range(n)]
    ap = [prefs("a", i) for i in range(n)]
    got = gale_shapley(pp, ap)
    allm = all_stable_matchings(pp, ap)
    assert got in allm
    # proposer-optimal: every proposer weakly prefers `got`
    prank = [[0] * n for _ in range(n)]
    for p in range(n):
        for r, a in enumerate(pp[p]):
            prank[p][a] = r
    for m in allm:
        for p in range(n):
            assert prank[p][got[p]] <= prank[p][m[p]]


# --------------------------------------------------- closest pair

@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=2, max_size=25, unique=True))
def test_closest_pair_matches_brute(pts):
    from imagery_utils_spark.operators.dp import closest_pair_d2

    want_best = min((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                    for a, b in itertools.combinations(pts, 2))
    want_cnt = sum(1 for a, b in itertools.combinations(pts, 2)
                   if (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                   == want_best)
    assert closest_pair_d2(pts) == (want_best, want_cnt)
