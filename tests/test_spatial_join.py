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


def test_points_in_rects_boundary_sliver(spark):
    # Regression for the under-cover epsilon bug: a rect whose upper edge sits
    # a sub-epsilon sliver ABOVE a cell boundary (res 6 -> cell width 5.625
    # deg; old code subtracted 5.625e-9 before flooring, losing the sliver).
    # The point lives inside that sliver cell and inside the rect; the old
    # cover dropped the pair silently.
    rects = spark.createDataFrame(
        [("sliver", -1.0, -1.0, 1e-9, 1.0)],
        "rect_id string, xmin double, ymin double, xmax double, ymax double",
    )
    points = spark.createDataFrame(
        [("p_sliver", 5e-10, 0.5)], "pid string, lon double, lat double"
    )
    out = sj.points_in_rects(points, rects, res=6)
    assert {(r.pid, r.rect_id) for r in out.collect()} == {("p_sliver", "sliver")}


def _cover_x_range(xmin, xmax, res):
    """Pure-python replica of cover_rects' x-axis column arithmetic — the
    Spark expression is ((col + 180.0) / 360.0) * n then FLOOR, which is the
    identical IEEE-754 double sequence here."""
    n = 1 << res
    x0 = min(n - 1, max(0, int(np.floor((xmin + 180.0) / 360.0 * n))))
    x1 = min(n - 1, max(x0, int(np.floor((xmax + 180.0) / 360.0 * n))))
    return x0, x1


def _tag_x(lon, res):
    n = 1 << res
    return min(n - 1, max(0, int(np.floor((lon + 180.0) / 360.0 * n))))


@pytest.mark.parametrize("res", [4, 6, 10])
def test_cover_superset_property(res):
    # Hypothesis-style property (deterministic rng for reproducibility):
    # covered cells must be a superset of the tag cells of every point inside
    # the rect — especially for edges straddling cell boundaries within 1e-8.
    from hypothesis import given, settings, strategies as st

    n = 1 << res
    width = 360.0 / n

    @settings(max_examples=300, deadline=None)
    @given(
        bi=st.integers(min_value=1, max_value=n - 1),
        delta=st.floats(min_value=-1e-8, max_value=1e-8, allow_nan=False),
        span=st.floats(min_value=0.0, max_value=3.0, allow_nan=False),
        toff=st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                       exclude_max=True),
    )
    def check(bi, delta, span, toff):
        boundary = bi * width - 180.0
        xmax = boundary + delta
        xmin = xmax - span - 1e-6
        if xmin < -180.0 or xmax > 180.0:
            return
        x0, x1 = _cover_x_range(xmin, xmax, res)
        # a point anywhere in [xmin, xmax) — bias toward the upper sliver
        lon = xmin + (xmax - xmin) * toff
        lon = max(lon, np.nextafter(xmax, -np.inf) if toff > 0.5 else lon)
        if not (xmin <= lon < xmax):
            return
        assert x0 <= _tag_x(lon, res) <= x1, (
            f"under-cover: lon={lon!r} in [{xmin!r},{xmax!r}) tags "
            f"{_tag_x(lon, res)} outside cover [{x0},{x1}]"
        )

    check()


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
