"""Skew-aware ranking — two-phase row_number for hot partitions.

``Window.partitionBy(tile).orderBy(...)`` puts every row of a tile into one
task; with Zipf geography the hot tile holds a double-digit percentage of the
whole fact table, so that one task sorts ~N rows serially (the grouped-map
skew AQE cannot split — SURVEY.md §4 item 2). Two-phase formulation:

1. bucket each row by a monotone function of the leading order key
   (``floor(score)`` for descending score: higher bucket strictly sorts
   before lower);
2. ``row_number`` within (partition, bucket) — parallel across buckets, so
   the hot tile splits into ~#buckets tasks;
3. add per-(partition, bucket) offsets = count of rows in strictly-better
   buckets of the same partition (tiny aggregate, broadcast back).

Exactness requires the bucket to be monotone w.r.t. the order: rows in a
higher bucket always rank before rows in a lower one, and the within-bucket
window uses the full ordering for ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# The single-task window sort is CHEAP at surprisingly large group sizes
# once the projection is narrow (measured: hot tile ~25% of 25M narrow rows
# ranks in <1 s at local[32]; the staged two-phase pass costs 5x that —
# BENCH_r02 flagship_rank_skew_x200). skew_rank is a CONTINGENCY for groups
# whose serial sort would blow the task budget, not a default.
DEFAULT_SKEW_THRESHOLD_ROWS = 50_000_000


def rank_auto(
    df: DataFrame,
    partition_col: str,
    order_cols: list[Column],
    bucket: Column,
    out: str = "rank",
    max_group_rows: int | None = None,
    threshold: int = DEFAULT_SKEW_THRESHOLD_ROWS,
) -> DataFrame:
    """Auto-gated ranking (VERDICT r2 ask #6): the plain window unless the
    caller's ``max_group_rows`` estimate (from table stats, a prior
    aggregate, or pipeline metadata — never a speculative extra count job)
    says the hottest partition exceeds ``threshold`` rows, where a
    single-task sort stops fitting the task time/memory budget and the
    two-phase :func:`skew_rank` pays for its staging pass. With no estimate
    the plain window wins at every measured regime (BENCH_r02)."""
    if max_group_rows is not None and max_group_rows > threshold:
        return skew_rank(df, partition_col, order_cols, bucket, out=out)
    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    return df.withColumn(out, F.row_number().over(w).cast("int"))


def skew_rank(
    df: DataFrame,
    partition_col: str,
    order_cols: list[Column],
    bucket: Column,
    out: str = "rank",
    stage: bool = True,
) -> DataFrame:
    """row_number over (partition_col ORDER BY order_cols) computed without a
    single-task-per-partition sort. ``bucket`` must be monotone
    NON-INCREASING along the ordering (e.g. floor(score) when ordering by
    score DESC).

    r6 plan shape (guide §2.4): ONE exchange of the fact, keyed
    (partition, bucket) — the within-bucket window ranks on it, the
    per-(partition, bucket) sizes aggregate is planned over the SAME
    windowed child so ReuseExchange serves both consumers from one
    shuffle materialization, the cumulative offsets are a tiny window
    over bucket-count rows, and the offsets re-attach by broadcast (the
    fact is never shuffled again). This replaced a
    persist(MEMORY_AND_DISK) staging pass that materialized the whole
    fact through the block manager (16.7 s vs 4.6 s plain at the r5
    bench skew diagnostic). ``stage`` is kept for API compatibility;
    the exchange-reuse plan needs no staging.
    """
    del stage  # r6: single-exchange plan needs no staging persist
    b = df.withColumn("_bkt", bucket)
    w_in = Window.partitionBy(partition_col, "_bkt").orderBy(*order_cols)
    ranked = b.withColumn("_rn", F.row_number().over(w_in))
    # sizes from the ranked frame (NOT from ``b``): count(*) per group
    # equals max(row_number), and referencing _rn plus every carried
    # column (the _pin max) keeps this branch's pruned projection
    # identical to the join branch's, so ReuseExchange serves both
    # consumers from ONE materialized shuffle of the fact — otherwise
    # column pruning plans a private partial-agg exchange here and the
    # whole upstream (scan+derive+score) executes twice.
    _carried = [c for c in b.columns if c != "_bkt"]
    sizes = (ranked.groupBy(partition_col, "_bkt")
             .agg(F.max("_rn").alias("_n"),
                  F.max(F.struct(*_carried)).alias("_pin"))
             .drop("_pin"))
    w_off = (
        Window.partitionBy(partition_col)
        .orderBy(F.desc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).drop("_n")
    return (
        ranked.join(F.broadcast(offsets), [partition_col, "_bkt"])
        .withColumn(out, (F.col("_rn") + F.col("_off")).cast("int"))
        .drop("_bkt", "_off", "_rn")
    )
