"""Sinks (K1-K5) — the reference's shapefile/text/GeoTIFF outputs become
partitioned columnar tables + manifest tables.

* K1/K2 (shapefile sinks, /root/reference/pgc_mosaic.py:607-795): typed
  geometry tables written as parquet with WKT geometry columns — attribute
  fields are just columns.
* K3 (text manifests, /root/reference/pgc_mosaic.py:546-551): the per-tile
  contributor list as a table partitioned by tile; a text rendering is
  provided for drop-in compatibility.
* K4 (per-tile raster sink): ``partitionBy(tile)`` writes — each tile's rows
  land in their own directory, the columnar analog of one GeoTIFF per tile.
* K5 (XML provenance): one lineage/metrics row per output
  (operators.lineage covers the ledger; ``write_run_metadata`` emits the
  per-output record).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_geo_table(df: DataFrame, path: str, geom_col: str = "geom_wkt",
                    mode: str = "overwrite") -> None:
    """K1/K2 — geometry table sink (WKT column + typed attribute columns)."""
    if geom_col not in df.columns:
        raise ValueError(f"missing geometry column {geom_col}")
    df.write.mode(mode).parquet(path)


def write_tile_partitioned(df: DataFrame, path: str, tile_col: str = "tile_name",
                           mode: str = "overwrite") -> None:
    """K4 — one directory per tile (partition pruning on read; the writer
    shuffles by tile first so each tile directory is written by one task,
    avoiding many tiny files per partition)."""
    df.repartition(F.col(tile_col)).write.mode(mode).partitionBy(tile_col).parquet(path)


def write_intersect_manifests(contributors: DataFrame, path: str,
                              mode: str = "overwrite") -> None:
    """K3 — per-tile contributor manifests: a table (tile_name, scene_id,
    paint_order) partitioned by tile plus a text rendering per tile
    mirroring `{tile}_intersects.txt`."""
    write_tile_partitioned(
        contributors.select("tile_name", "scene_id", "paint_order"), path, mode=mode
    )


def render_manifest_text(contributors: DataFrame) -> DataFrame:
    """(tile_name, manifest_text) — newline-joined scene ids in paint order,
    byte-compatible with the reference's *_intersects.txt body."""
    return (
        contributors.groupBy("tile_name")
        .agg(
            F.concat_ws(
                "\n",
                F.array_sort(
                    F.collect_list(F.struct("paint_order", "scene_id"))
                ).getField("scene_id"),
            ).alias("manifest_text")
        )
    )


def write_run_metadata(spark, path: str, outputs: list[dict], mode: str = "append") -> None:
    """K5 — one provenance row per produced output (the XML sink's fields as
    columns: output name, source, params, timestamps)."""
    if not outputs:
        return
    df = spark.createDataFrame(outputs)
    df.coalesce(1).write.mode(mode).parquet(path)
