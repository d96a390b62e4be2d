"""Blocked fuzzy matching (entity resolution) via edit distance.

Web-corpus canonicalization constantly reconciles dirty strings against
a clean reference (site names, authors, product titles; the reference
pipeline's analog is its filename-signature trial-match,
functions/naming.py). The naive formulation is an O(n*m) cross join
with a Levenshtein filter — unrunnable at corpus scale. The standard
fix is BLOCKING: join only within a cheap equality block whose key is
invariant under the expected error model, then run the expensive
distance inside blocks.

Scale contract:
 - the block join is a plain hash equi-join (broadcastable when the
   clean side is a dimension table — the usual case);
 - ``levenshtein`` evaluates JVM-side inside codegen, only on block
   pairs;
 - block-size skew is the caller's dial: a tighter block_key trades
   recall for work; the operator reports block sizes via
   ``block_stats`` so hot blocks are visible, not silent.
 - recall is exact WITHIN the declared error model (errors that keep
   the block key); cross-block typos are declared misses, the standard
   blocking trade-off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["prefix_block_key", "blocked_fuzzy_join", "block_stats"]


def prefix_block_key(name, n: int = 4) -> Column:
    """Lowercased first-n-chars block key — invariant to suffix typos."""
    return F.lower(F.substring(name, 1, n))


def blocked_fuzzy_join(dirty: DataFrame, clean: DataFrame,
                       dirty_col: str, clean_col: str,
                       max_dist: int = 2, block_n: int = 4,
                       broadcast_clean: bool = True) -> DataFrame:
    """All (dirty, clean, dist) pairs with edit distance <= max_dist
    sharing a block. Callers pick the best match downstream (min dist,
    then lexical tie-break) — keeping ranking separate keeps this
    operator a pure pair generator."""
    d = dirty.withColumn("_bk", prefix_block_key(F.col(dirty_col),
                                                 block_n))
    c = clean.withColumn("_bk", prefix_block_key(F.col(clean_col),
                                                 block_n))
    if broadcast_clean:
        c = F.broadcast(c)
    dist = F.levenshtein(F.col(dirty_col), F.col(clean_col))
    return (d.join(c, "_bk")
            .withColumn("dist", dist)
            .filter(F.col("dist") <= max_dist)
            .drop("_bk"))


def block_stats(df: DataFrame, col: str, block_n: int = 4) -> DataFrame:
    """Block-size histogram — the skew diagnostic for block_key choice."""
    return (df.groupBy(prefix_block_key(F.col(col), block_n)
                       .alias("block"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n")))


# --------------------------------------------------- Jaro–Winkler (1990)

def jaro_similarity_py(s1: str, s2: str) -> float:
    """From the published definition (Jaro 1989): match window
    max(|s1|,|s2|)/2 - 1, greedy left-to-right matching, transpositions
    = half the out-of-order matched pairs."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - window), min(l2, i + window + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler_py(s1: str, s2: str, p: float = 0.1,
                    boost_threshold: float = 0.7) -> float:
    """Winkler's prefix-boosted variant exactly as published: the
    common-prefix bonus (l ≤ 4, scale p = 0.1) applies ONLY when the
    base Jaro similarity exceeds the 0.7 boost threshold — the detail
    Winkler's original code carries and naive reimplementations drop."""
    j = jaro_similarity_py(s1, s2)
    if j <= boost_threshold:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * p * (1.0 - j)


def jaro_winkler_cols(df: DataFrame, a: str, b: str,
                      out_jaro: str = "jaro",
                      out_jw: str = "jw") -> DataFrame:
    """Arrow-batched pandas UDF computing both scores. Python is
    unavoidable here (positional matching has no column-algebra form);
    the batch transfer keeps it off the per-row interpreter path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _scores_fn(xs, ys):
        ja = [jaro_similarity_py(x, y) for x, y in zip(xs, ys)]
        jw = [jaro_winkler_py(x, y) for x, y in zip(xs, ys)]
        return pd.DataFrame({"jaro": ja, "jw": jw})

    _scores = pandas_udf(_scores_fn, "struct<jaro: double, jw: double>")

    return (df.withColumn("_jwc", _scores(F.col(a), F.col(b)))
            .withColumn(out_jaro, F.col("_jwc.jaro"))
            .withColumn(out_jw, F.col("_jwc.jw")).drop("_jwc"))
