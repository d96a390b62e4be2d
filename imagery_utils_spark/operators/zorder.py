"""Z-order (Morton) clustering of spatial tables — the data-layout step a
100-TB tile pipeline runs before writing, so that spatially-close rows
land in the same files and a tile-scoped query touches O(tile) bytes
instead of O(table) (the public Delta Lake ``OPTIMIZE ZORDER BY`` /
Iceberg sort-order idea applied to the page table).

``morton_col`` is the bit-interleaved cell id as ONE closed-form JVM
column expression (shift/and/or algebra — whole-stage codegen, no UDF),
bit-identical to :func:`core.cells.lonlat_to_morton` including the
``res << 56`` tag, and SQL-renderable for the DuckDB oracle
(``morton_sql``).

``zorder_repartition`` then range-partitions on that key and sorts within
partitions.  Scale shape: ``repartitionByRange`` samples the key (one
lightweight pass) and performs exactly one shuffle; the within-partition
sort is spillable.  Because Z-order is prefix-contiguous, any res-r
ancestor cell maps to ONE contiguous key range, so downstream per-tile
readers (or min/max-pruned parquet scans over the written files) skip
everything else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.spatial_join import cell_col  # noqa: F401  (re-export kin)


def _xy_cols(lon: Column, lat: Column, res: int):
    n = 1 << res
    x = F.least(F.lit(n - 1), F.greatest(
        F.lit(0), F.floor((lon + 180.0) / 360.0 * n))).cast("long")
    y = F.least(F.lit(n - 1), F.greatest(
        F.lit(0), F.floor((lat + 90.0) / 180.0 * n))).cast("long")
    return x, y


def morton_col(lon: Column, lat: Column, res: int) -> Column:
    """``(res << 56) | interleave(x, y)`` — x on even bits, y on odd,
    matching core.cells.morton_encode bit for bit."""
    x, y = _xy_cols(lon, lat, res)
    z = F.lit(int(res) << 56).cast("long")
    for i in range(res):
        z = (z
             + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                           2 * i + 1))
    return z


def morton_sql(lon: str, lat: str, res: int) -> str:
    """The identical id in ANSI SQL (DuckDB oracle parity). Emits a scalar
    expression over pre-computed integer exprs ``x``/``y`` — wrap in a CTE
    that defines them via :func:`cell_xy_sql`."""
    terms = [str(int(res) << 56)]
    for i in range(res):
        terms.append(f"((((x >> {i}) & 1)) << {2 * i})")
        terms.append(f"((((y >> {i}) & 1)) << {2 * i + 1})")
    return "cast(" + " + ".join(terms) + " as bigint)"


def cell_xy_sql(lon: str, lat: str, res: int) -> tuple[str, str]:
    n = 1 << res
    x = (f"cast(least({n - 1}, greatest(0, "
         f"floor(({lon} + 180.0) / 360.0 * {n}))) as bigint)")
    y = (f"cast(least({n - 1}, greatest(0, "
         f"floor(({lat} + 90.0) / 180.0 * {n}))) as bigint)")
    return x, y


def zorder_repartition(df: DataFrame, res: int = 10, lon: str = "lon",
                       lat: str = "lat", num_partitions: int | None = None,
                       key_out: str = "zkey") -> DataFrame:
    """Cluster rows by Morton key: range-partition (sampled split points,
    one shuffle) + spillable within-partition sort.  Keep ``key_out`` in
    the written table so file-level parquet min/max stats prune whole
    files for any cell-range predicate."""
    out = df.withColumn(key_out, morton_col(F.col(lon), F.col(lat), res))
    parts = [num_partitions] if num_partitions else []
    return (out.repartitionByRange(*parts, key_out)
            .sortWithinPartitions(key_out))


def zorder_locality_stats(df: DataFrame, res: int = 10,
                          parent_res: int = 4,
                          key_col: str = "zkey") -> DataFrame:
    """Diagnostic: per output partition, how many distinct parent cells
    (res ``parent_res``) it touches — the files-per-tile figure a layout
    is judged by (lower = better locality)."""
    shift = 2 * (res - parent_res)
    parent = F.shiftright(
        F.col(key_col).bitwiseAND(F.lit((1 << 56) - 1)), shift)
    return (df.withColumn("_pid", F.spark_partition_id())
            .withColumn("_parent", parent)
            .groupBy("_pid")
            .agg(F.countDistinct("_parent").alias("n_parent_cells"),
                 F.count("*").alias("n_rows")))
