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


def _dist(qcol, centroid: list[int]):
    carr = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(qcol, carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def assign_clusters(df: DataFrame, qcol,
                    centroids: dict[int, list[int]]) -> DataFrame:
    """Append (cid, d): nearest centroid by exact integer distance,
    ties to the smallest cid (struct array_min is lexicographic)."""
    pairs = F.array(*[
        F.struct(_dist(qcol, cv).alias("d"),
                 F.lit(int(cid)).alias("cid"))
        for cid, cv in sorted(centroids.items())
    ])
    best = F.array_min(pairs)
    return df.withColumn("d", best["d"]).withColumn("cid", best["cid"])


def _update(asg: DataFrame, qcol, dim: int) -> dict[int, list[int]]:
    """Exact integer centroid update, collected to the driver (k x dim
    ints). Clusters that lost every member drop out."""
    agg = asg.groupBy("cid").agg(
        F.count("*").alias("n"),
        *[F.sum(F.element_at(qcol, i + 1)).alias(f"s{i}")
          for i in range(dim)])
    out = {}
    for r in agg.collect():
        out[r["cid"]] = [r[f"s{i}"] // r["n"] for i in range(dim)]
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
    q = df.select(F.col(id_col), quantize_col(vec).alias("qv"))
    init = {r[id_col]: list(r["qv"])
            for r in q.filter(F.col(id_col) < k).collect()}
    cent = init
    asg = None
    for t in range(iters):
        asg = assign_clusters(q, F.col("qv"), cent)
        if t < iters - 1:
            cent = _update(asg, F.col("qv"), dim)
    return asg
