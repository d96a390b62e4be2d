"""Tile compositing + pyramid rollups (the raster math, rank-formulated).

R2 — vector->raster compositing (/root/reference/pgc_mosaic_build_tile.py:139-183):
the reference paints contributors sequentially in ascending score order so
the **last writer (highest score) wins per pixel**. Order-dependence becomes
a rankable parallel form: ``row_number() over (partition by tile, cell order
by score desc) = 1`` — per-cell winner, no sequential paint, no skew beyond
the groupBy AQE already splits.

R5 — pyramid levels (``gdaladdo 2 4 8 16``, pgc_mosaic_build_tile.py:216):
coarser-resolution aggregates = parent-cell rollups; with morton ids a parent
is a bit shift, with linear ids closed-form floor math (SQL-parity form in
spatial_join.cell_sql / parent_cell_col here).

A1/A2 — band statistics (/root/reference/lib/mosaic.py:649-719): grouped
min/max/mean/stddev/count + exact median over non-null values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_writer_wins(
    df: DataFrame,
    cell_cols: list[str],
    order_cols: list[Column],
    out: str = "is_visible",
) -> DataFrame:
    """Mark the winning contributor per cell (rank 1 under the paint order
    reversed — highest score first). Filter on ``is_visible`` to materialize
    the composite."""
    w = Window.partitionBy(*cell_cols).orderBy(*order_cols)
    return df.withColumn(out, F.row_number().over(w) == 1)


def composite(df: DataFrame, cell_cols: list[str], order_cols: list[Column]) -> DataFrame:
    return last_writer_wins(df, cell_cols, order_cols).filter(F.col("is_visible")).drop("is_visible")


def parent_cell_col(cell: Column, res: int, dres: int = 1) -> Column:
    """Linear-id parent: (y >> d) * 2^(r-d) + (x >> d) as floor math."""
    n = 1 << res
    np_ = 1 << (res - dres)
    d = 1 << dres
    x = cell % n
    y = F.floor(cell / n)
    return (F.floor(y / d) * np_ + F.floor(x / d)).cast("long")


def parent_cell_sql(cell: str, res: int, dres: int = 1) -> str:
    n = 1 << res
    np_ = 1 << (res - dres)
    d = 1 << dres
    return (f"cast(floor(floor({cell} / {n}) / {d}) * {np_} "
            f"+ floor(({cell} % {n}) / {d}) as bigint)")


def pyramid_rollup(
    df: DataFrame,
    cell_col_name: str,
    res: int,
    levels: list[int],
    aggs: list[Column],
) -> DataFrame:
    """Union of rollups at each coarser level (gdaladdo 2/4/8/16 analog).
    Output: (level_res, cell, <aggs>). Each level aggregates the base table;
    Catalyst pushes partial aggregation map-side so the fact table is
    scanned once per level with map-side combine."""
    outs = []
    for lvl in levels:
        dres = res - lvl
        parent = parent_cell_col(F.col(cell_col_name), res, dres)
        outs.append(
            df.groupBy(parent.alias("cell"))
            .agg(*aggs)
            .withColumn("level_res", F.lit(lvl))
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result.select("level_res", "cell", *[c for c in result.columns
                                                if c not in ("level_res", "cell")])


def band_stats(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """A1 + A2: per-group min/max/mean/stddev/count + exact median over
    non-null values (the reference's median is exact — lib/mosaic.py:704-707
    — so ``percentile``, not ``percentile_approx``)."""
    v = F.col(value_col)
    return df.filter(v.isNotNull()).groupBy(*group_cols).agg(
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.avg(v).alias("mean"),
        F.stddev(v).alias("stddev"),
        F.count(v).alias("datapixelcount"),
        F.expr(f"percentile({value_col}, 0.5)").alias("median"),
    )
