"""Fixed-point k-means over embedding columns — iterative clustering
that is bit-identical at any partitioning / cluster size.

Floating k-means is NOT reproducible on a cluster: float sums depend on
partition/merge order. This implementation quantizes each embedding to
int64 once (x * 2^20 is a power-of-two scale — exponent shift only, no
mantissa rounding — then floor), after which every step is exact
integer algebra:

* **distance** — sum of squared int64 differences (64-dim, bounded by
  ~2^47 per pair: no overflow);
* **assignment** — argmin with ties broken by centroid id, expressed as
  ``array_min`` over (dist, cid) structs (lexicographic struct compare,
  pure JVM codegen);
* **update** — per-dim integer sums (associative/commutative —
  order-independent) and an exact floor division
  ``(s - pmod(s, n)) / n`` (the subtraction makes the dividend exactly
  divisible, so the double division is exact and the result matches
  Python's ``//`` and SQL's remainder-adjusted ``//``).

Topology mirrors MLlib's KMeans: centroids are driver-resident (k x dim
ints — trivially small), shipped into each iteration as literal arrays
(an implicit broadcast: the fact side scans once per iteration with NO
shuffle and no lineage growth), and only the per-cluster aggregates
come back. The SQL oracle unrolls the same iterations as CTEs.

Reference parity: imagery_utils has no clustering, but its mosaic
"semantic grouping" of contributors (pgc_mosaic grouping by catalog id
/ acquisition) is the nearest analog; this operator is the
training-data-pipeline generalization (embedding-space bucketing for
near-dup triage and topic balance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_col", "kmeans_fixed", "SCALE_BITS"]

SCALE_BITS = 20


def quantize_col(vec, scale_bits: int = SCALE_BITS):
    """array<float> -> array<long>: floor(x * 2^scale_bits)."""
    s = float(1 << scale_bits)
    return F.transform(
        vec, lambda e: F.floor(e.cast("double") * F.lit(s)).cast("long"))


def assign_clusters(df: DataFrame, qcol,
                    centroids: dict[int, list[int]]) -> DataFrame:
    """Append (cid, d): nearest centroid by exact integer distance,
    ties to the smallest cid (struct min is lexicographic).

    Centroids travel as a BROADCAST one-row frame carrying the whole
    centroid set as an array<struct<cid, arr>> COLUMN, not as literal
    arrays baked into the expression tree: the plan stays
    constant-size in k (8 x 64 literals already made Catalyst analysis
    the dominant test-scale cost, and a k=1024 literal plan would not
    survive), the broadcast crossJoin attaches the set to every row
    with ZERO shuffle, and the argmin is array_min over transform —
    still a pure projection, exactly like the literal form."""
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [([(int(c), [int(v) for v in arr])
           for c, arr in sorted(centroids.items())],)],
        "_cents array<struct<cid: long, arr: array<bigint>>>")
    dists = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(qcol, c["arr"],
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            .alias("d"),
            c["cid"].alias("cid")))
    best = F.array_min(dists)
    return (df.crossJoin(F.broadcast(cdf))
            .withColumn("d", best["d"])
            .withColumn("cid", best["cid"])
            .drop("_cents"))


def _update(asg: DataFrame, qcol, dim: int) -> dict[int, list[int]]:
    """Exact integer centroid update, collected to the driver (k x dim
    ints). posexplode keeps the aggregate ONE generic expression
    instead of ``dim`` sum columns (constant-size plan in dim);
    integer sums stay order-independent. Clusters that lost every
    member drop out."""
    ex = asg.select("cid", F.posexplode(qcol).alias("_i", "_v"))
    agg = (ex.groupBy("cid", "_i")
           .agg(F.sum("_v").alias("s"), F.count("*").alias("n"))
           .collect())
    out: dict[int, list[int]] = {}
    for r in agg:
        out.setdefault(r["cid"], [0] * dim)[r["_i"]] = r["s"] // r["n"]
    return out


def floor_div_cols(s, n):
    """Exact floor division as a Column: (s - pmod(s, n)) / n — the
    dividend is exactly divisible, so the double division is exact and
    floor semantics match Python // and the SQL remainder adjustment."""
    return ((s - F.pmod(s, n)) / n).cast("long")


def kmeans_fixed(df: DataFrame, vec, k: int = 8, dim: int = 64,
                 iters: int = 3, id_col: str = "vec_id"):
    """Run ``iters`` exact iterations; initial centroids are the
    quantized vectors of the k smallest ids. Returns (final assignment
    DataFrame with d/cid, final centroids dict computed distributed —
    see floor_div_cols)."""
    # materialize the quantized vectors once (r6): every iteration's
    # assign scan, every update explode and the init collect would
    # otherwise re-read + re-quantize the source (2 jobs per iteration)
    q = df.select(F.col(id_col), quantize_col(vec).alias("qv")
                  ).localCheckpoint()
    init = {r[id_col]: list(r["qv"])
            for r in q.filter(F.col(id_col) < k).collect()}
    cent = init
    asg = None
    for t in range(iters):
        asg = assign_clusters(q, F.col("qv"), cent)
        if t < iters - 1:
            cent = _update(asg, F.col("qv"), dim)
    return asg
