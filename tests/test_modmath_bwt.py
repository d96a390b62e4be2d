"""Unit tests for modular-arithmetic kernels (square-and-multiply,
BSGS discrete log) and the Wyllie list-ranking BWT inversion —
pinned against CPython pow()/brute force and the sequential
bwt_forward/bwt_inverse reference pair."""

import random

from pyspark.sql import functions as F


def test_with_modpow_matches_pow(spark):
    from imagery_utils_spark.operators.modmath import with_modpow

    rng = random.Random(11)
    rows = [(i, rng.randrange(2, 2000), rng.randrange(0, 4000),
             rng.choice([1997, 2003, 65521, 2_147_483_647]))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, b long, e long, m long")
    got = {r.id: r.r for r in
           with_modpow(df, "r", "b", "e", "m", 12).collect()}
    for i, b, e, m in rows:
        assert got[i] == pow(b, e, m), (i, b, e, m)


def test_bsgs_discrete_log_minimal(spark):
    from imagery_utils_spark.operators.modmath import bsgs_discrete_log

    rng = random.Random(3)
    rows = []
    for i in range(20):
        p = rng.choice([211, 223, 227, 229, 233])
        g = rng.randrange(2, p - 1)
        x = rng.randrange(0, p - 1)
        rows.append((i, p, g, pow(g, x, p)))
    df = spark.createDataFrame(rows, "doc_id long, p long, g long, h long")
    got = {r.doc_id: r.dlog
           for r in bsgs_discrete_log(df, max_m=16).collect()}
    for i, p, g, h in rows:
        want = next(k for k in range(p - 1) if pow(g, k, p) == h)
        assert got[i] == want, (i, p, g, h)


def test_invert_bwt_df_roundtrip(spark):
    from imagery_utils_spark.operators.bwt import (
        SENTINEL, bwt_forward, invert_bwt_df)

    rng = random.Random(7)
    texts = {0: "banana", 1: "mississippi", 2: "a"}
    for d in range(3, 9):
        texts[d] = "".join(rng.choice("abcz ")
                           for _ in range(rng.randrange(1, 60)))
    rows = [(d, j, c) for d, t in texts.items()
            for j, c in enumerate(bwt_forward(t))]
    df = spark.createDataFrame(rows, "doc long, j long, c string")
    inv = invert_bwt_df(df, max_len=128).collect()
    got = {}
    for r in inv:
        got.setdefault(r.doc, {})[r.i] = r.out_c
    for d, t in texts.items():
        rec = "".join(got[d][i] for i in range(len(t)))
        assert rec == t, d
        assert SENTINEL not in rec


def test_symmetric_matrix_power_identity():
    # guards the (a,b,d) symmetric-product algebra used by the
    # fib_matrix_power query: R·B for commuting symmetric matrices
    M = 1_000_000_007

    def mul(x, y):
        (a1, b1, d1), (a2, b2, d2) = x, y
        return ((a1 * a2 + b1 * b2) % M, (a1 * b2 + b1 * d2) % M,
                (b1 * b2 + d1 * d2) % M)

    for n in (1, 2, 3, 10, 999, 12345):
        r, b = (1, 0, 1), (1, 1, 0)
        e = n
        while e:
            if e & 1:
                r = mul(r, b)
            b = mul(b, b)
            e >>= 1
        fa, fb = 0, 1
        for _ in range(n):
            fa, fb = fb, (fa + fb) % M
        assert r[1] == fa, n
