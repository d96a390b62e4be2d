"""Unit tests for the Borůvka MSF operator and the sequence kernels
behind the mst_edges / lis_length / interval_schedule battery rows —
each checked against an independent brute-force or textbook-alternative
implementation, mirroring the battery's oracle strategy in-process."""

import itertools
import random

from imagery_utils_spark.operators.dp import (lis_length_patience,
                                              max_nonoverlap_intervals)


def _kruskal(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total, picked = 0, []
    for u, v, w in sorted(edges, key=lambda t: t[2]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            total += w
            picked.append((u, v, w))
    return total, sorted(picked)


def _lis_brute(seq):
    best = 0
    n = len(seq)
    for mask in range(1 << n):
        picked = [seq[i] for i in range(n) if mask >> i & 1]
        if all(a < b for a, b in zip(picked, picked[1:])):
            best = max(best, len(picked))
    return best


def _sched_brute(ivs):
    best = 0
    n = len(ivs)
    for mask in range(1 << n):
        sel = [ivs[i] for i in range(n) if mask >> i & 1]
        sel.sort()
        if all(a[1] <= b[0] for a, b in zip(sel, sel[1:])):
            best = max(best, len(sel))
    return best


def test_lis_patience_vs_brute():
    rng = random.Random(7)
    for _ in range(60):
        seq = [rng.randrange(-8, 9) for _ in range(rng.randrange(0, 13))]
        assert lis_length_patience(seq) == _lis_brute(seq)


def test_lis_edge_cases():
    assert lis_length_patience([]) == 0
    assert lis_length_patience([5]) == 1
    assert lis_length_patience([3, 3, 3]) == 1  # strict
    assert lis_length_patience([1, 2, 3]) == 3


def test_interval_greedy_vs_brute():
    rng = random.Random(11)
    for _ in range(60):
        n = rng.randrange(0, 12)
        ivs = []
        for _ in range(n):
            s = rng.randrange(0, 30)
            ivs.append((s, s + rng.randrange(1, 10)))
        assert max_nonoverlap_intervals(ivs) == _sched_brute(ivs)


def test_boruvka_matches_kruskal_random(spark):
    from imagery_utils_spark.operators.graph import \
        minimum_spanning_forest

    rng = random.Random(3)
    n = 12
    # connected: spine + random extras; distinct weights by low bits
    pairs = {(i, i + 1) for i in range(n - 1)}
    for _ in range(25):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((min(u, v), max(u, v)))
    edges = [(u, v, rng.randrange(100) * 256 + u * 16 + v)
             for u, v in sorted(pairs)]
    exp_total, exp_edges = _kruskal(n, edges)
    df = spark.createDataFrame(edges, "u long, v long, w long")
    got = sorted(tuple(r) for r in minimum_spanning_forest(df).collect())
    assert got == exp_edges
    assert sum(t[2] for t in got) == exp_total
    assert len(got) == n - 1


def test_boruvka_forest_on_disconnected(spark):
    from imagery_utils_spark.operators.graph import \
        minimum_spanning_forest

    # two components -> spanning FOREST with n1-1 + n2-1 edges
    edges = [(0, 1, 10), (1, 2, 20), (0, 2, 30),
             (5, 6, 11), (6, 7, 21), (5, 7, 31)]
    df = spark.createDataFrame(edges, "u long, v long, w long")
    got = sorted(tuple(r) for r in minimum_spanning_forest(df).collect())
    assert got == [(0, 1, 10), (1, 2, 20), (5, 6, 11), (6, 7, 21)]
