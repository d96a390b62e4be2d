"""Loaders for the driver-provided parquet tables (read-only, TESTDATA.md).

Analog of the reference's scan operators S1/S5 (directory / vector-index
scans, /root/reference/lib/utils.py:204-225): at scale these become
``spark.read.table`` over Iceberg; here they read parquet directly, and
Catalyst still gets predicate pushdown + column pruning on the scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition an UNDER-parallel input before a heavy
    per-row (pandas-UDF) stage.

    A small parquet table arrives as one split (files below
    maxPartitionBytes never subdivide), so an Arrow UDF over it runs
    single-threaded no matter how many cores the session has. At 100-TB
    scale scans arrive with thousands of splits and this is a no-op (the
    gate fires only when partitions < half the default parallelism); when
    it does fire, the inserted shuffle moves only the small table."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def load_filelist(spark: SparkSession, path: str,
                  col: str = "src_path") -> DataFrame:
    """S2 — a reference 'textfile of image paths' source
    (/root/reference/pgc_ortho.py:300-310 reads src as a .txt of paths,
    one per line): ``spark.read.text`` with blank/comment lines dropped
    and whitespace trimmed. Join it ``left_semi`` against the files table
    to scope a run, exactly the reference's list-driven selection."""
    lines = spark.read.text(path)
    v = F.trim(F.col("value"))
    return (
        lines.select(v.alias(col))
        .filter((F.length(col) > 0) & ~F.col(col).startswith("#"))
        .dropDuplicates([col])
    )
