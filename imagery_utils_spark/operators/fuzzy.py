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
