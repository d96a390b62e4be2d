"""Time-series regularization: dense calendar grid + forward fill.

Crawl/telemetry metrics arrive on the days something happened; trend
models and retention math need one row per (key, day) with the last
known value carried forward. Two distributed pieces:

``dense_grid``
    keys × [min_day, max_day] via ``sequence`` + ``explode`` — the grid
    is GENERATED, never shuffled in: one broadcast of the 1-row global
    (min, max) aggregate onto the distinct-key frame, then a JVM-side
    explode. At 10^8 keys × 3650 days the grid is produced partition-
    locally, already partitioned by whatever produced the keys.

``forward_fill``
    the portable gaps-and-islands fill: ``count(value) OVER (PARTITION
    BY key ORDER BY day)`` counts non-null observations, so every gap
    day shares a group id with the observation that opened it; the
    per-(key, grp) max is that observation's value. Two windows over
    the SAME (key, day) ordering = one shuffle, one sort. This form is
    deliberately chosen over ``last(value, ignorenulls=True)`` because
    it is expressible IDENTICALLY in ANSI SQL (the DuckDB oracle runs
    the same two windows), and it never widens frames beyond what the
    sort already provides.

Scale shape: one hash shuffle on key for the fill windows; the grid
explode multiplies rows before the shuffle, so at extreme spans prefer
repartitioning on key FIRST and exploding after (order preserved here
because explode is partition-local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dense_grid", "forward_fill", "gap_fill_daily"]


def dense_grid(obs: DataFrame, key: str, day: str) -> DataFrame:
    """(key, day) for every key in ``obs`` × every day in the GLOBAL
    [min(day), max(day)] span. ``day`` is an integer day index."""
    span = obs.agg(F.min(day).alias("_d0"), F.max(day).alias("_d1"))
    return (obs.select(key).distinct()
            .crossJoin(F.broadcast(span))
            .select(key, F.explode(
                F.sequence(F.col("_d0"), F.col("_d1"))).alias(day)))


def forward_fill(grid: DataFrame, key: str, day: str,
                 val: str) -> DataFrame:
    """Carry the last non-null ``val`` forward along ``day`` per key.

    Adds ``filled`` (last known value; NULL before the first
    observation) and ``is_gap`` (this row had no observation).
    """
    w = Window.partitionBy(key).orderBy(day)
    g = grid.withColumn("_grp", F.count(val).over(w))
    wg = Window.partitionBy(key, "_grp")
    return (g.withColumn("filled", F.max(val).over(wg))
            .withColumn("is_gap", F.col(val).isNull())
            .drop("_grp"))


def gap_fill_daily(obs: DataFrame, key: str, day: str,
                   val: str) -> DataFrame:
    """Dense (key, day, filled, is_gap) from sparse observations —
    ``dense_grid`` left-joined with the observations, then
    ``forward_fill``. Observations must be unique per (key, day);
    pre-aggregate otherwise."""
    grid = dense_grid(obs, key, day)
    joined = grid.join(obs.select(key, day, val), [key, day], "left")
    return forward_fill(joined, key, day, val)
