"""Physical table layout — the real optimizer lever at 100 TB (SURVEY.md §7:
"Iceberg partition layout (bucket by cell prefix, sort by (cell, score)) is
the real 'physical optimizer'").

* :func:`write_cell_partitioned` — pages partitioned by a coarse cell prefix
  and sorted within files by (cell, score): spatial queries (tile reads,
  kNN ring probes) become partition-pruned scans + min/max-skippable pages.
* :func:`read_cells` — partition-pruned read of a cell-id set.
* On Iceberg the same layout is
  ``PARTITIONED BY (bucket(N, cell_prefix))`` + ``WRITE ORDERED BY cell,
  score DESC``; parquet directories stand in for partitions here with
  identical pruning behavior (asserted in tests via the file-source
  PartitionFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.spatial_join import cell_col


def with_layout_cols(pages: DataFrame, prefix_res: int = 3, fine_res: int = 10,
                     lon: str = "lon", lat: str = "lat") -> DataFrame:
    return (
        pages.withColumn("cell_prefix", cell_col(F.col(lon), F.col(lat), prefix_res))
        .withColumn("cell", cell_col(F.col(lon), F.col(lat), fine_res))
    )


def write_cell_partitioned(pages: DataFrame, path: str, prefix_res: int = 3,
                           fine_res: int = 10, mode: str = "overwrite") -> None:
    """partitionBy(cell_prefix) + within-partition sort by (cell, score DESC
    when present): row groups become cell-contiguous, so parquet min/max
    stats prune fine cells inside each partition."""
    df = with_layout_cols(pages, prefix_res, fine_res)
    sort_cols = ["cell"] + (["score"] if "score" in df.columns else [])
    (
        df.repartition(F.col("cell_prefix"))
        .sortWithinPartitions(*[F.col(c) for c in sort_cols])
        .write.mode(mode)
        .partitionBy("cell_prefix")
        .parquet(path)
    )


def read_cells(spark: SparkSession, path: str, cell_prefixes: list[int]) -> DataFrame:
    """Partition-pruned read: only the named prefix directories are scanned."""
    return spark.read.parquet(path).filter(F.col("cell_prefix").isin(cell_prefixes))
