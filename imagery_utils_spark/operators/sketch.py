"""KMV (k-minimum-values) distinct-count sketch — deterministic and
cross-engine exact.

Bar-Yossef et al. 2002: the k smallest hash values of a set determine
an unbiased cardinality estimate ``(k-1) * M / h_(k)`` (M = hash-space
size, h_(k) = k-th minimum). Unlike HLL the sketch is a plain sorted
list of longs, so it is:

* **mergeable** — union of sketches = k smallest of the concatenation,
  i.e. a ``groupBy`` + per-group top-k, map-side combinable (each
  partition contributes at most k values — the shuffle carries
  O(k x groups), never the raw distinct values);
* **deterministic** — the estimate depends only on the hash function
  and the set, not on partitioning, traversal order, or merge order;
  the same job at N and 4N executors emits identical sketches, and a
  SQL engine can replay it bit-for-bit.

Hash contract: the first 15 hex chars of sha256(value) parsed as an
integer — a 60-bit value that fits signed int64 on both engines (Spark
``conv(hex, 16, 10)``; DuckDB ``('0x' || hex)::bigint``), avoiding
engine-specific hash functions (xxhash64/murmur differ across
engines) and any decimal/shift gymnastics.

The estimate ``(k-1) * 2^60 / h_(k)`` is one int/int double division —
exact IEEE, same on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sha_hash63_col", "kmv_sketch", "kmv_estimate"]

HASH_SPACE = 1 << 60


def sha_hash63_col(value) -> F.Column:
    """Deterministic 60-bit hash: first 15 hex chars of sha256 -> int64."""
    hx = F.substring(F.sha2(value.cast("string"), 256), 1, 15)
    return F.conv(hx, 16, 10).cast("long")


def kmv_sketch(df: DataFrame, group_cols: list[str], value,
               k: int = 64) -> DataFrame:
    """Per group: sorted array of the k smallest distinct hashes.

    Distinct-before-rank matters (duplicate values share a hash and
    must count once); the rank runs per group over the DISTINCT hash
    set. At scale the pre-distinct is map-side combinable and the
    window input is already collapsed to distinct hashes."""
    h = sha_hash63_col(value).alias("_h")
    d = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy(*group_cols)
            .agg(F.sort_array(F.collect_list("_h")).alias("sketch")))


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Cardinality estimate per group: exact count when the sketch is
    not full (fewer than k distinct values — the sketch IS the set),
    else (k-1) * 2^63 / h_(k)."""
    n = F.size("sketch")
    kth = F.element_at("sketch", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / kth)
    return sketches.withColumn("est_distinct", est)
