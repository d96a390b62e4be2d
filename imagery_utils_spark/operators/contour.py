"""Marching-squares contour extraction — the gdal_contour analog over
the engine's long-format cell rasters (here: crawl-density surfaces).

Midpoint variant (no interpolation): corners classify as above/below
the level; each 2×2 corner window contributes the standard
marching-squares segments with endpoints at edge MIDPOINTS, expressed
in half-unit integer coordinates — so the whole geometry is exact
integers, partitioning-independent, and value-hashable cross-engine.
The two ambiguous saddle cases (5: TR+BL, 10: TL+BR) resolve by
connecting each ABOVE corner to its own two adjacent edges (the
"separate the above corners" rule) — pinned in tests.

Scale shape: corner gather reuses operators/stencil.stencil_gather
(emit-to-neighbor, ONE shuffle keyed by cell); the case table is a
static F.when chain over 16 configs (pure JVM, codegen) followed by a
partition-local explode. No Python, no driver geometry.

Reference kinship: gdal_contour / gdaldem are the raster→vector
products next to the reference's mosaic outputs; the density surface
contoured here is the crawl hot-spot map of SURVEY §2's tile layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imagery_utils_spark.operators.stencil import stencil_gather

__all__ = ["contour_segments", "SEGMENT_TABLE"]

# edge midpoints in half-units relative to the window origin (2x, 2y);
# grid y grows "down" here — a naming convention only, both engines and
# the oracle share it.
_TOP, _RIGHT, _BOTTOM, _LEFT = (1, 0), (2, 1), (1, 2), (0, 1)

# config = 8*TL + 4*TR + 2*BR + 1*BL (corner >= level)
SEGMENT_TABLE: dict[int, list[tuple[tuple[int, int], tuple[int, int]]]] = {
    0: [], 15: [],
    1: [(_BOTTOM, _LEFT)],
    2: [(_BOTTOM, _RIGHT)],
    3: [(_LEFT, _RIGHT)],
    4: [(_TOP, _RIGHT)],
    5: [(_TOP, _RIGHT), (_BOTTOM, _LEFT)],    # saddle: separate aboves
    6: [(_TOP, _BOTTOM)],
    7: [(_TOP, _LEFT)],
    8: [(_TOP, _LEFT)],
    9: [(_TOP, _BOTTOM)],
    10: [(_TOP, _LEFT), (_BOTTOM, _RIGHT)],   # saddle: separate aboves
    11: [(_TOP, _RIGHT)],
    12: [(_LEFT, _RIGHT)],
    13: [(_BOTTOM, _RIGHT)],
    14: [(_BOTTOM, _LEFT)],
}


def _seg_struct(x, y, p, q):
    """Canonical (x1,y1,x2,y2) struct — endpoints ordered by the static
    (x, y) compare of their offsets so the rendering is deterministic."""
    if q < p:
        p, q = q, p
    return F.struct(
        (2 * x + p[0]).cast("long").alias("x1"),
        (2 * y + p[1]).cast("long").alias("y1"),
        (2 * x + q[0]).cast("long").alias("x2"),
        (2 * y + q[1]).cast("long").alias("y2"))


def contour_segments(cells: DataFrame, level: int, x: str = "x",
                     y: str = "y", v: str = "v") -> DataFrame:
    """(x1, y1, x2, y2) half-unit segments of the ``v >= level``
    iso-boundary. ``cells`` must be DENSE over its rectangle (missing
    cells are not zero-filled here — compose with a dense grid)."""
    g = stencil_gather(
        cells, F.col(x), F.col(y), F.col(v),
        offsets={"tl": (0, 0), "tr": (1, 0), "br": (1, 1),
                 "bl": (0, 1)},
        require_full=True)
    b = [F.when(F.col(f"v_{t}") >= level, w).otherwise(0)
         for t, w in (("tl", 8), ("tr", 4), ("br", 2), ("bl", 1))]
    g = g.withColumn("_cfg", sum(b[1:], b[0]))
    xx, yy = F.col(x), F.col(y)
    segs = F.lit(None)
    expr = None
    for cfg, pairs in SEGMENT_TABLE.items():
        arr = (F.array(*[_seg_struct(xx, yy, p, q) for p, q in pairs])
               if pairs else
               F.array().cast("array<struct<x1:bigint,y1:bigint,"
                              "x2:bigint,y2:bigint>>"))
        expr = (F.when(F.col("_cfg") == cfg, arr) if expr is None
                else expr.when(F.col("_cfg") == cfg, arr))
    return (g.select(F.explode(expr).alias("s"))
            .select("s.x1", "s.y1", "s.x2", "s.y2"))
