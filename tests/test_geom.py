import numpy as np
import pytest

from imagery_utils_spark.core import geom


SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


def test_parse_wkt():
    coords, offsets = geom.parse_wkt_polygon(SQUARE)
    assert coords.shape == (4, 2)  # closing vertex dropped
    assert list(offsets) == [0, 4]


def test_parse_wkt_with_hole():
    # hole wound opposite (CW) to the CCW shell, per OGC convention
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    coords, offsets = geom.parse_wkt_polygon(wkt)
    assert list(offsets) == [0, 4, 8]
    assert geom.polygon_area(coords, offsets) == pytest.approx(100 - 4)


def test_area_and_envelope():
    coords, offsets = geom.parse_wkt_polygon(SQUARE)
    assert geom.polygon_area(coords, offsets) == pytest.approx(100.0)
    assert geom.envelope(coords) == (0.0, 0.0, 10.0, 10.0)


def test_wkt_roundtrip():
    coords, offsets = geom.parse_wkt_polygon(SQUARE)
    coords2, offsets2 = geom.parse_wkt_polygon(geom.polygon_wkt(coords, offsets))
    assert np.allclose(coords, coords2)


def test_points_in_polygon():
    coords, offsets = geom.parse_wkt_polygon(SQUARE)
    px = [5.0, -1.0, 10.5, 0.5, 9.99]
    py = [5.0, 5.0, 5.0, 0.5, 9.99]
    inside = geom.points_in_polygon(px, py, coords, offsets)
    assert list(inside) == [True, False, False, True, True]


def test_points_in_polygon_hole():
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    coords, offsets = geom.parse_wkt_polygon(wkt)
    inside = geom.points_in_polygon([5.0, 1.0], [5.0, 1.0], coords, offsets)
    assert list(inside) == [False, True]  # hole wound opposite direction


def test_points_in_concave():
    # C-shape
    wkt = "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))"
    coords, offsets = geom.parse_wkt_polygon(wkt)
    inside = geom.points_in_polygon([5.0, 1.0, 5.0], [5.0, 1.0, 9.0], coords, offsets)
    assert list(inside) == [False, True, True]


def test_envelopes_intersect():
    r = geom.envelopes_intersect(
        np.asarray([0.0, 0.0]), np.asarray([0.0, 0.0]),
        np.asarray([1.0, 1.0]), np.asarray([1.0, 1.0]),
        np.asarray([0.5, 2.0]), np.asarray([0.5, 2.0]),
        np.asarray([2.0, 3.0]), np.asarray([2.0, 3.0]),
    )
    assert list(r) == [True, False]


def test_does_cross_180():
    ring, _ = geom.parse_wkt_polygon("POLYGON ((179 10, -179 10, -179 12, 179 12, 179 10))")
    assert geom.does_cross_180(ring)
    ring2, _ = geom.parse_wkt_polygon("POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))")
    assert not geom.does_cross_180(ring2)


def test_wrap_geometry_180():
    # rectangle crossing the anti-meridian (ref semantics: lib/utils.py:561-645)
    ring, _ = geom.parse_wkt_polygon("POLYGON ((179 10, -179 10, -179 12, 179 12, 179 10))")
    parts = geom.wrap_geometry_180(ring)
    assert len(parts) == 2
    west = next(p for p in parts if p[:, 0].min() <= -179.0)
    east = next(p for p in parts if p[:, 0].max() >= 179.0)
    # interpolated crossing points land exactly on +/-180
    assert (-180.0 in west[:, 0]) and (180.0 in east[:, 0])
    # total area preserved (two 1x1-deg boxes in lon-shifted space)
    a = sum(abs(geom.ring_area(p)) for p in parts)
    assert a == pytest.approx(2 * 2.0)  # lon span 2 deg total, lat span 2 deg
