"""Sequence packing — the concat-and-chunk step that turns a filtered
corpus into fixed-length training sequences (the GPT-style recipe:
concatenate documents in a deterministic order, slice into seq_len-token
windows). The operator computes each document's EXACT global token
offset, from which its chunk span follows arithmetically.

The core is a distributed exclusive prefix sum over the deterministic
document order — the textbook two-phase formulation:

1. range-partition by the order key (one shuffle; partition p holds keys
   strictly below partition p+1 — the RangePartitioner contract);
2. per-partition totals (tiny: one row per partition) are collected and
   prefix-summed DRIVER-side — O(#partitions), not O(rows);
3. each row's offset = its partition's base + the within-partition
   running sum (a window over the already-sorted partition, no extra
   shuffle).

No global single-partition window anywhere — the naive
``Window.orderBy(id)`` formulation funnels 100 TB through one task;
this one never materializes more than a partition per task plus a
#partitions-sized driver array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_col

__all__ = ["global_offsets", "pack_sequences"]


def global_offsets(df: DataFrame, size_col: str, order_col: str,
                   out: str = "start") -> DataFrame:
    """Exclusive prefix sum of ``size_col`` over ``order_col`` order,
    computed with the two-phase scheme above. Adds ``out`` (int64)."""
    d = (df.repartitionByRange(F.col(order_col))
         .sortWithinPartitions(order_col)
         .withColumn("_pid", F.spark_partition_id()))
    part_sums = (d.groupBy("_pid")
                 .agg(F.sum(size_col).alias("_psum"))
                 .collect())
    base = {}
    acc = 0
    for r in sorted(part_sums, key=lambda r: r._pid):
        base[r._pid] = acc
        acc += r._psum or 0
    bases = d.sparkSession.createDataFrame(
        [(int(p), int(b)) for p, b in base.items()],
        "_pid int, _base long")
    w = (Window.partitionBy("_pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (d.join(F.broadcast(bases), "_pid")
            .withColumn(out, (F.col("_base")
                              + F.coalesce(F.sum(size_col).over(w),
                                           F.lit(0))).cast("long"))
            .drop("_pid", "_base"))


def pack_sequences(df: DataFrame, seq_len: int, text: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per document: token count, exact global start offset, and the
    first/last seq_len-token chunk it lands in (empty docs get NULL
    chunks). Chunk ids are stable under re-runs and resumes because the
    order is the id, not the partitioning."""
    with_n = df.select(id_col,
                       token_count_col(F.col(text)).alias("n_tokens"))
    off = global_offsets(with_n, "n_tokens", id_col)
    nonempty = F.col("n_tokens") > 0
    return off.select(
        id_col, "n_tokens", "start",
        F.when(nonempty, F.floor(F.col("start") / seq_len))
        .cast("long").alias("first_chunk"),
        F.when(nonempty,
               F.floor((F.col("start") + F.col("n_tokens") - 1) / seq_len))
        .cast("long").alias("last_chunk"),
    )
