"""Raster stencil gather — neighborhood operators (hillshade/slope/
aspect, focal stats) over long-format cell tables with ONE shuffle.

imagery_utils' raster math (ortho + mosaic smoothing, gdaldem-style
slope/aspect products) reads 3x3 windows per pixel. The naive
relational translation is eight self-joins — eight shuffles of the full
raster. The scale-correct plan inverts the data flow: every cell EMITS
its value to the 9 (x+dx, y+dy) positions it participates in, and one
groupBy((x, y)) gathers each cell's full neighborhood; conditional-max
pivots the tagged values into columns. Cost: a 9x map-side fan-out
(pure JVM array+explode, no Python) and a single hash shuffle keyed by
cell — the same key the raster is already partitioned by downstream,
so Catalyst reuses the exchange for following per-cell stages.

Horn (1981) gradient on the gathered window:
  dz/dx = (ne + 2*e + se) - (nw + 2*w + sw)
  dz/dy = (sw + 2*s + se) - (nw + 2*n + ne)
kept in exact integer algebra (slope^2 = dzdx^2 + dzdy^2, aspect as an
8-way sign/magnitude octant) so results are bit-identical at any
partitioning and replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stencil_gather", "horn_gradient_cols", "NEIGHBORS_3X3"]

# tag -> (dx, dy) of the neighbor RELATIVE to the gathering cell
NEIGHBORS_3X3 = {
    "nw": (-1, -1), "n": (0, -1), "ne": (1, -1),
    "w": (-1, 0), "c": (0, 0), "e": (1, 0),
    "sw": (-1, 1), "s": (0, 1), "se": (1, 1),
}


def stencil_gather(cells: DataFrame, x, y, v,
                   offsets: dict[str, tuple[int, int]] | None = None,
                   require_full: bool = True) -> DataFrame:
    """(x, y, v_<tag>...) — each cell's tagged neighborhood values.

    A cell at (cx, cy) receives tag t from the cell at
    (cx + dx_t, cy + dy_t), i.e. every source cell emits v to target
    (x - dx_t, y - dy_t) for each tag. ``require_full=True`` keeps only
    cells whose whole window exists (interior cells — gdaldem's edge
    behavior)."""
    offsets = NEIGHBORS_3X3 if offsets is None else offsets
    emits = F.explode(F.array(*[
        F.struct((x - F.lit(dx)).cast("long").alias("gx"),
                 (y - F.lit(dy)).cast("long").alias("gy"),
                 F.lit(tag).alias("tag"))
        for tag, (dx, dy) in offsets.items()
    ])).alias("_e")
    long_ = cells.select(v.alias("_v"), emits).select(
        F.col("_e.gx").alias("x"), F.col("_e.gy").alias("y"),
        F.col("_e.tag").alias("tag"), "_v")
    gathered = long_.groupBy("x", "y").agg(*[
        F.max(F.when(F.col("tag") == t, F.col("_v"))).alias(f"v_{t}")
        for t in offsets
    ])
    if require_full:
        cond = None
        for t in offsets:
            c = F.col(f"v_{t}").isNotNull()
            cond = c if cond is None else (cond & c)
        gathered = gathered.filter(cond)
    return gathered


def horn_gradient_cols(g: DataFrame) -> DataFrame:
    """Append integer Horn gradient + slope^2 + aspect octant to a
    3x3-gathered frame. Octant encoding (deterministic, branch-exact
    in SQL): bit2 = dzdx < 0, bit1 = dzdy < 0, bit0 = |dzdx| < |dzdy|."""
    dzdx = ((F.col("v_ne") + 2 * F.col("v_e") + F.col("v_se"))
            - (F.col("v_nw") + 2 * F.col("v_w") + F.col("v_sw")))
    dzdy = ((F.col("v_sw") + 2 * F.col("v_s") + F.col("v_se"))
            - (F.col("v_nw") + 2 * F.col("v_n") + F.col("v_ne")))
    g = g.withColumn("dzdx", dzdx).withColumn("dzdy", dzdy)
    octant = (F.when(F.col("dzdx") < 0, 4).otherwise(0)
              + F.when(F.col("dzdy") < 0, 2).otherwise(0)
              + F.when(F.abs(F.col("dzdx")) < F.abs(F.col("dzdy")), 1)
              .otherwise(0))
    return (g.withColumn(
        "slope_q",
        F.col("dzdx") * F.col("dzdx") + F.col("dzdy") * F.col("dzdy"))
        .withColumn("octant", octant))
