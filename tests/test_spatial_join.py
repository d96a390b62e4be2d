import numpy as np
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.core import cells
from imagery_utils_spark.operators import spatial_join as sj


def test_cell_col_matches_numpy(spark):
    rng = np.random.default_rng(3)
    pts = [(float(lon), float(lat)) for lon, lat in
           zip(rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200))]
    pts += [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for res in (2, 8, 14):
        got = df.select(sj.cell_col(F.col("lon"), F.col("lat"), res).alias("c")).collect()
        exp = cells.lonlat_to_linear([p[0] for p in pts], [p[1] for p in pts], res)
        assert [r.c for r in got] == list(exp)


def test_cell_sql_matches_column(spark):
    df = spark.createDataFrame(
        [(l * 1.7 - 170.0, l * 0.83 - 80.0) for l in range(200)], "lon double, lat double"
    )
    df.createOrReplaceTempView("pts_cells_test")
    got_sql = spark.sql(
        f"select {sj.cell_sql('lon', 'lat', 9)} as c from pts_cells_test"
    ).collect()
    got_col = df.select(sj.cell_col(F.col("lon"), F.col("lat"), 9).alias("c")).collect()
    assert [r.c for r in got_sql] == [r.c for r in got_col]


def test_points_in_rects(spark):
    rects = spark.createDataFrame(
        [("r1", -10.0, -10.0, 10.0, 10.0), ("r2", 5.0, 5.0, 30.0, 30.0)],
        "rect_id string, xmin double, ymin double, xmax double, ymax double",
    )
    points = spark.createDataFrame(
        [("p_in_both", 7.0, 7.0), ("p_r1", -5.0, 0.0), ("p_r2", 20.0, 20.0),
         ("p_none", 50.0, 50.0), ("p_edge_low", -10.0, -10.0), ("p_edge_high", 10.0, 10.0)],
        "pid string, lon double, lat double",
    )
    out = sj.points_in_rects(points, rects, res=6)
    pairs = {(r.pid, r.rect_id) for r in out.collect()}
    assert pairs == {
        ("p_in_both", "r1"), ("p_in_both", "r2"),
        ("p_r1", "r1"), ("p_r2", "r2"),
        ("p_edge_low", "r1"),      # closed lower edge
        ("p_edge_high", "r2"),     # open upper edge of r1, inside r2
    }


def test_points_in_rects_is_broadcast(spark):
    rects = spark.createDataFrame(
        [("r1", -10.0, -10.0, 10.0, 10.0)],
        "rect_id string, xmin double, ymin double, xmax double, ymax double",
    )
    points = spark.createDataFrame([("p", 0.0, 0.0)], "pid string, lon double, lat double")
    plan = sj.points_in_rects(points, rects, res=6)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # no shuffle of the fact side


def test_points_in_polygons_concave(spark):
    # C-shaped polygon: envelope cover has false positives; PIP refine drops them
    wkt = "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))"
    polys = spark.createDataFrame([("c", wkt)], "poly_id string, geom_wkt string")
    points = spark.createDataFrame(
        [("inside_arm", 5.0, 1.0), ("inside_top", 5.0, 9.0),
         ("in_notch", 5.0, 5.0), ("outside", 20.0, 20.0)],
        "pid string, lon double, lat double",
    )
    out = sj.points_in_polygons(points, polys, res=8)
    got = {r.pid for r in out.collect()}
    assert got == {"inside_arm", "inside_top"}


def test_points_in_polygons_antimeridian(spark):
    # polygon spanning the anti-meridian is split and still matches points on
    # both sides (getWrappedGeometry parity)
    wkt = "POLYGON ((179 10, -179 10, -179 12, 179 12, 179 10))"
    polys = spark.createDataFrame([("am", wkt)], "poly_id string, geom_wkt string")
    points = spark.createDataFrame(
        [("west", -179.5, 11.0), ("east", 179.5, 11.0), ("far", 0.0, 11.0)],
        "pid string, lon double, lat double",
    )
    out = sj.points_in_polygons(points, polys, res=7)
    got = {r.pid for r in out.collect()}
    assert got == {"west", "east"}


def test_cover_rects_matches_numpy(spark):
    rects = spark.createDataFrame(
        [("a", -1.0, -1.0, 1.0, 1.0), ("b", 170.0, 60.0, 180.0, 90.0)],
        "rect_id string, xmin double, ymin double, xmax double, ymax double",
    )
    out = sj.cover_rects(rects, res=6)
    got = {}
    for r in out.collect():
        got.setdefault(r.rect_id, set()).add(r.cell)
    exp_a = set(cells.cover_bbox_linear(-1.0, -1.0, 1.0, 1.0, 6).tolist())
    exp_b = set(cells.cover_bbox_linear(170.0, 60.0, 180.0, 90.0, 6).tolist())
    assert got["a"] == exp_a
    assert got["b"] == exp_b
