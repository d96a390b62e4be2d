"""Distributed exact selection — per-stratum "k smallest by hash"
without sorting the stratum.

Exact-count stratified sampling (keep exactly k = ceil(p/q * n) rows
per stratum, reproducibly) needs the k-th order statistic of a hash
key per stratum. The naive plan — row_number() over (partition by
stratum order by hash) — sorts EVERY row of every stratum through one
reducer per stratum: a non-starter when a stratum holds 10^10 rows.

The two-pass histogram selection here is the classic distributed
quantile-select:

1. **histogram** — one map-side-combinable groupBy over
   (stratum, bucket = hash >> (60 - B)): at B=10 that is at most
   1024 x |strata| rows, collected to the driver (driver-resident
   boundary state, like k-means centroids — trivially small).
2. **boundary resolution (driver)** — walking each stratum's buckets
   in ascending order locates the bucket b* containing the k-th
   smallest hash and how many rows are still needed from it
   (``need = k - rows_below``). Buckets below b* are kept whole;
   buckets above are dropped whole. Because the bucket index is a
   monotone function of the hash, this is exact, and (hash, id) is a
   total order so ties cannot straddle the cut.
3. **filter + boundary sort** — a broadcast join ships (b*, need) to
   the fact; rows below b* pass with a pure filter (no shuffle), and
   ONLY the boundary bucket — an expected n/2^B sliver — goes through
   the per-stratum row_number window.

The kept set is exactly the k smallest (hash, id) pairs per stratum —
bit-identical at any partitioning, resumable, and replayable by a
full-sort SQL oracle (which is the independent check: different
algorithm, same set).

The sampled fraction is a rational p/q with k = (n*p + q - 1) // q —
never a float multiply (0.2 * 500 rounds UP in IEEE; the integer form
cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imagery_utils_spark.operators.sketch import sha_hash63_col

__all__ = ["stratified_sample_exact", "select_k_smallest"]

HASH_BITS = 60


def stratified_sample_exact(df: DataFrame, stratum: str, key,
                            p: int = 1, q: int = 5,
                            bucket_bits: int = 10) -> DataFrame:
    """Keep exactly ceil(p/q * n) rows per stratum — the k smallest by
    (sha60(key), key). Returns the input rows + _h, plus per-stratum
    _n_total/_k columns for downstream accounting."""
    return select_k_smallest(df, stratum, sha_hash63_col(key), key,
                             p=p, q=q, bucket_bits=bucket_bits)


def select_k_smallest(df: DataFrame, stratum: str, order_col, tie_col,
                      p: int = 1, q: int = 5,
                      bucket_bits: int = 10,
                      value_bits: int = HASH_BITS) -> DataFrame:
    """Keep exactly the k = ceil(p/q * n) smallest rows per stratum by
    (order_col, tie_col), order_col a non-negative int64 < 2^value_bits.

    With a sha hash as order_col this is reproducible sampling
    (buckets uniform; value_bits stays 60). With a VALUE as order_col
    it is an exact order-statistic / quantile selection — the caller
    MUST state the key's magnitude via value_bits (buckets are the top
    ``bucket_bits`` of a ``value_bits``-wide key; leaving 60 for a
    26-bit value puts everything in bucket 0 and the boundary window
    silently becomes a full sort — found by the hypothesis property
    test). Skewed value distributions concentrate the boundary bucket
    (correctness unaffected; the window still sees only that bucket).
    Returns input rows + _h (the order key) + per-stratum
    _n_total/_k."""
    spark = df.sparkSession
    shift = max(value_bits - bucket_bits, 0)
    base = (df.withColumn("_h", order_col.cast("long"))
            .withColumn("_bkt", F.shiftright(F.col("_h"), shift)))
    key = tie_col
    hist = (base.groupBy(stratum, "_bkt").agg(F.count("*").alias("c"))
            .collect())
    per: dict = {}
    for r in hist:
        per.setdefault(r[stratum], []).append((r["_bkt"], r["c"]))
    bounds = []
    for s, buckets in per.items():
        n = sum(c for _, c in buckets)
        k = (n * p + q - 1) // q
        below = 0
        bstar, need = -1, 0
        for b, c in sorted(buckets):
            if below + c >= k:
                bstar, need = b, k - below
                break
            below += c
        bounds.append((s, int(bstar), int(need), int(n), int(k)))
    bdf = spark.createDataFrame(
        bounds, schema=f"{stratum} string, _bstar long, _need long, "
                       "_n_total long, _k long")
    j = base.join(F.broadcast(bdf), stratum)
    low = j.filter(F.col("_bkt") < F.col("_bstar"))
    w = (Window.partitionBy(stratum)
         .orderBy(F.col("_h"), key))
    bnd = (j.filter(F.col("_bkt") == F.col("_bstar"))
           .withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") <= F.col("_need"))
           .drop("_rn"))
    return low.unionByName(bnd).drop("_bkt", "_bstar", "_need")
