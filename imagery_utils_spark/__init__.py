"""imagery_utils_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query / data-processing semantics of
PolarGeospatialCenter/imagery_utils (reference read-only at /root/reference)
as idiomatic PySpark DataFrame operators + vectorized pandas/Arrow UDFs:

- mosaic cutline selection (greedy set-cover, two-pass)   -> operators.cutline
- tile-grid assignment + naming                           -> operators.tile_grid
- quality scoring (golden-value-exact)                    -> functions.scoring
- spatial join (cell equi-join + exact refine)            -> operators.spatial_join
- raster<->vector tile math (rank compositing, rollups)   -> operators.compose
- training-data ops (dedup / similarity / text analysis)  -> operators.dedup,
                                                             operators.similarity,
                                                             functions.text

The execution engine is Spark (Catalyst + Tungsten + AQE); nothing is ported
from the reference's GDAL-subprocess/HPC-scheduler execution model.
"""

__version__ = "0.1.0"
