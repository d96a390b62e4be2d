"""Loaders for the driver-provided parquet tables (read-only, TESTDATA.md).

Analog of the reference's scan operators S1/S5 (directory / vector-index
scans, /root/reference/lib/utils.py:204-225): at scale these become
``spark.read.table`` over Iceberg; here they read parquet directly, and
Catalyst still gets predicate pushdown + column pruning on the scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
