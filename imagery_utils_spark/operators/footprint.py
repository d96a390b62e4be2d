"""R1 — raster->vector exact trimmed footprint (``GetExactTrimmedGeom``,
/root/reference/lib/mosaic.py:911-981) as a grouped-map operator.

Reference semantics, faithfully reproduced over a cell-occupancy grid instead
of raster scanlines:

* scan every ``step``-th row of the group's occupancy grid;
* per scanned row with data: right-edge point ``(last_col + 1, row)`` into the
  top list, left-edge point ``(first_col, row)`` into the bottom list
  (``pixelst``/``pixelsb``, :943-947);
* ring = top list (scan order) + reversed bottom list (:948-949), converted
  from pixel to map coordinates via ``pl2xy`` (C3) incl. the half-cell y
  offset, then closed;
* Douglas-Peucker simplification with ``tolerance`` (OGR ``Simplify``) —
  reimplemented here (pure numpy) since footprints are open staircase rings.

In the webtext graft a "scene" is a page strip and "pixels with data" are the
grid cells the strip's pages occupy — the raster->vector semantics carry over
unchanged (footprint-of-occupancy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import pl2xy


def _dp_simplify(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on an open polyline (ring passed open; first point
    anchored like OGR's Simplify on the ring boundary)."""
    if len(pts) <= 2 or tol <= 0:
        return pts
    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[b] - pts[a]
        L = np.hypot(*seg)
        if L == 0:
            d = np.hypot(*(pts[a + 1:b] - pts[a]).T)
        else:
            d = np.abs(np.cross(seg, pts[a + 1:b] - pts[a])) / L
        i = int(np.argmax(d))
        if d[i] > tol:
            keep[a + 1 + i] = True
            stack.append((a, a + 1 + i))
            stack.append((a + 1 + i, b))
    return pts[keep]


def trimmed_footprint_from_grid(occ: np.ndarray, gtf, step: int = 4,
                                tolerance: float = 1.0) -> np.ndarray:
    """occ: 2-D bool occupancy (rows = lines). Returns ring vertices (N,2)."""
    pixelst, pixelsb = [], []
    for line in range(0, occ.shape[0], step):
        nz = np.flatnonzero(occ[line])
        if nz.size > 0:
            pixelst.append((int(nz[-1]) + 1, line))
            pixelsb.append((int(nz[0]), line))
    pixelsb.reverse()
    pixels = pixelst + pixelsb
    if not pixels:
        return np.empty((0, 2))
    pts = np.asarray([pl2xy(gtf, p, l) for p, l in pixels], dtype=np.float64)
    return _dp_simplify(pts, tolerance)


TRIMMED_SCHEMA = "group_id string, footprint_wkt string, n_vertices int"


def trimmed_footprints(
    points: DataFrame,
    group_col: str,
    res: int = 8,
    step: int = 1,
    tolerance: float = 0.0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-group staircase footprint polygon from occupied grid cells.
    groupBy(group).applyInPandas — parallel across groups like the
    reference's per-image fan-out."""
    n = 1 << res
    cw, ch = 360.0 / n, 180.0 / n

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = str(pdf[group_col].iloc[0])
        x = np.clip(((pdf[lon].values + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        y = np.clip(((pdf[lat].values + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
        x0, x1 = int(x.min()), int(x.max())
        y0, y1 = int(y.min()), int(y.max())
        occ = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
        occ[y.astype(int) - y0, x.astype(int) - x0] = True
        # gdal-style geotransform anchored at the occupancy window's top-left
        # (lines run north->south, so row 0 = max lat edge)
        gtf = (
            -180.0 + x0 * cw,  # origin x
            cw,                # pixel width
            0.0,
            -90.0 + (y1 + 1) * ch,  # origin y (top edge)
            0.0,
            -ch,               # pixel height (negative, north-up)
        )
        ring = trimmed_footprint_from_grid(occ[::-1], gtf, step=step, tolerance=tolerance)
        if len(ring) == 0:
            wkt = None
        else:
            pts = ", ".join(f"{a:.16f} {b:.16f}" for a, b in ring)
            first = f"{ring[0][0]:.16f} {ring[0][1]:.16f}"
            wkt = f"POLYGON (( {pts}, {first} ))"
        return pd.DataFrame({"group_id": [gid], "footprint_wkt": [wkt],
                             "n_vertices": [len(ring)]})

    return points.groupBy(group_col).applyInPandas(run, schema=TRIMMED_SCHEMA)
