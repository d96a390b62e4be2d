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
