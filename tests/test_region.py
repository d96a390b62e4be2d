import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imagery_utils_spark.core.geom import parse_wkt_polygon
from imagery_utils_spark.core.region import Region


def R(x0, y0, x1, y1):
    return Region.from_rect(x0, y0, x1, y1)


def test_rect_basics():
    a = R(0, 0, 10, 10)
    assert a.area() == 100
    assert not a.is_empty()
    assert R(5, 5, 5, 9).is_empty()


def test_union_disjoint_and_overlap():
    a = R(0, 0, 10, 10)
    b = R(20, 0, 30, 10)
    assert a.union(b).area() == 200
    c = R(5, 0, 15, 10)
    assert a.union(c).area() == 150


def test_intersection():
    a = R(0, 0, 10, 10)
    b = R(5, 5, 15, 15)
    i = a.intersection(b)
    assert i.area() == 25
    assert i.bounds() == (5, 5, 10, 10)
    assert a.intersection(R(20, 20, 30, 30)).is_empty()


def test_difference():
    a = R(0, 0, 10, 10)
    b = R(5, 0, 10, 10)
    assert a.difference(b).area() == 50
    # punch a hole
    hole = R(4, 4, 6, 6)
    assert a.difference(hole).area() == 96
    # full cover
    assert a.difference(R(-1, -1, 11, 11)).is_empty()


def test_intersects():
    a = R(0, 0, 10, 10)
    assert a.intersects(R(9, 9, 20, 20))
    assert not a.intersects(R(10, 0, 20, 10))  # open boundary: touching is not intersecting
    assert not a.intersects(R(50, 50, 60, 60))


def test_from_polygon_rectilinear_exact():
    # L-shape
    coords, offsets = parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))"
    )
    r = Region.from_polygon(coords, offsets)
    assert r.area() == pytest.approx(10 * 4 + 4 * 6)


def test_from_polygon_with_hole():
    coords, offsets = parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    r = Region.from_polygon(coords, offsets)
    assert r.area() == pytest.approx(96.0)


def test_from_polygon_triangle_approx():
    coords, offsets = parse_wkt_polygon("POLYGON ((0 0, 10 0, 0 10, 0 0))")
    r = Region.from_polygon(coords, offsets, max_slab=0.01)
    assert r.area() == pytest.approx(50.0, rel=1e-3)


def test_algebra_identities():
    a = R(0, 0, 10, 10)
    b = R(5, 5, 15, 15)
    # A = (A\B) u (A n B)
    lhs = a.difference(b).union(a.intersection(b))
    assert lhs.area() == pytest.approx(a.area())
    # inclusion-exclusion
    assert a.union(b).area() == pytest.approx(a.area() + b.area() - a.intersection(b).area())


rects = st.tuples(
    st.integers(0, 20), st.integers(0, 20), st.integers(1, 10), st.integers(1, 10)
).map(lambda t: R(t[0], t[1], t[0] + t[2], t[1] + t[3]))


@settings(max_examples=60, deadline=None)
@given(rects, rects, rects)
def test_property_inclusion_exclusion(a, b, c):
    ab = a.union(b)
    assert ab.area() == pytest.approx(a.area() + b.area() - a.intersection(b).area())
    # difference is anti-monotone in second arg
    assert a.difference(b.union(c)).area() <= a.difference(b).area() + 1e-9
    # (A\B) n B is empty
    assert a.difference(b).intersection(b).is_empty()


@settings(max_examples=40, deadline=None)
@given(rects, rects)
def test_property_symmetry(a, b):
    assert a.union(b).area() == pytest.approx(b.union(a).area())
    assert a.intersection(b).area() == pytest.approx(b.intersection(a).area())
    assert a.intersects(b) == b.intersects(a)


def test_intersect_extent_join_pairs(spark):
    """J8 DF form: open-interval overlap (touching edges excluded), exact
    greatest/least extents, broadcast small side."""
    from pyspark.sql import functions as F

    from imagery_utils_spark.operators.catalog import intersect_extent_join

    a = spark.createDataFrame(
        [("s1", 0.0, 0.0, 10.0, 10.0), ("s2", 20.0, 0.0, 30.0, 5.0)],
        "id_a string, axmin double, aymin double, axmax double, aymax double")
    b = spark.createDataFrame(
        [(1, 5.0, 5.0, 15.0, 15.0),   # overlaps s1 corner
         (2, 10.0, 0.0, 20.0, 10.0),  # touches s1 edge only -> excluded
         (3, 25.0, 1.0, 26.0, 2.0)],  # inside s2
        "id_b int, bxmin double, bymin double, bxmax double, bymax double")
    got = {(r["id_a"], r["id_b"]): r for r in
           intersect_extent_join(a, b).collect()}
    assert set(got) == {("s1", 1), ("s2", 3)}
    r = got[("s1", 1)]
    assert (r["ixmin"], r["iymin"], r["ixmax"], r["iymax"]) == (5.0, 5.0, 10.0, 10.0)
    assert r["ix_area"] == 25.0
    r2 = got[("s2", 3)]
    assert r2["ix_area"] == 1.0
    plan = intersect_extent_join(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
