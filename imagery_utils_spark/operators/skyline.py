"""Distributed 2-D skyline (pareto frontier) — minimize x, maximize y.

The classic sequential algorithm (sort by x asc, keep rows whose y
exceeds the running max) needs a total order, i.e. a single-partition
window — a non-starter at 10^12 rows. The distributed form exploits the
skyline identity ``skyline(P1 ∪ P2) = skyline(skyline(P1) ∪ skyline(P2))``:

1. **collapse** — per distinct x keep max y (a plain groupBy; map-side
   combinable; any skyline point must be its x-group's max y);
2. **local frontier** — hash-bucket the collapsed points and run the
   sort/running-max pass *per bucket* (window partitioned by bucket —
   parallel, no global sort). Each bucket emits only its own frontier,
   a tiny superset of the global skyline restricted to that bucket;
3. **global frontier** — rerun the same pass once over the union of
   bucket frontiers. This input is candidate-sized (frontiers are
   typically orders of magnitude smaller than the data; worst case —
   fully anti-correlated data — the skyline IS the answer and no
   algorithm shrinks it).

Dominance semantics: s dominates r iff s.x <= r.x and s.y >= r.y with
at least one strict; duplicate points never dominate each other, so a
skyline *point* keeps all its duplicate rows (the caller joins back
for multiplicity).

Reference parity: imagery_utils' mosaic contributor selection keeps,
per tile, the non-dominated quality/overlap candidates before scoring
(pgc_mosaic_build_tile.py candidate filtering); this is that filter as
a scale-safe relational operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline2d"]


def _frontier(points: DataFrame, part_cols: list[str]) -> DataFrame:
    """Keep (x, ymax) rows not dominated within their partition.

    ``points`` must hold one row per (part, x) — the x-collapse
    guarantees no order-by ties, so the rowsBetween frame is exactly
    'all strictly-smaller x'. A row survives iff its y is strictly
    above every smaller-x row's y (<= means some cheaper x matches or
    beats it — dominated)."""
    w = (Window.partitionBy(*part_cols) if part_cols
         else Window.partitionBy(F.lit(0)))
    w = w.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    prev = F.max("ymax").over(w)
    return (points.withColumn("_pm", prev)
            .filter(F.col("_pm").isNull() | (F.col("ymax") > F.col("_pm")))
            .drop("_pm"))


def skyline2d(df: DataFrame, x, y, n_buckets: int = 32) -> DataFrame:
    """Skyline points (x, ymax) of df under (min x, max y)."""
    pts = df.select(x.alias("x"), y.alias("y"))
    loc = (pts.groupBy(F.pmod(F.hash("x"), F.lit(n_buckets)).alias("_b"),
                       "x")
           .agg(F.max("y").alias("ymax")))
    lf = _frontier(loc, ["_b"])
    glob = lf.groupBy("x").agg(F.max("ymax").alias("ymax"))
    return _frontier(glob, [])
