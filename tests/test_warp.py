import numpy as np
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.core import proj as PROJ
from imagery_utils_spark.operators import warp as W


def test_polar_forward_golden():
    # EPSG:3031 at its true-scale parallel on the central meridian:
    # published coordinate ~ (0, 2082760.11) m
    x, y = PROJ.polar_stereo_forward([0.0], [-71.0], 3031)
    assert x[0] == pytest.approx(0.0, abs=1e-6)
    assert y[0] == pytest.approx(2082760.1085, abs=0.1)
    # north pole -> origin
    x, y = PROJ.polar_stereo_forward([123.0], [90.0], 3413)
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6


def test_polar_roundtrip():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 500)
    for epsg, lat in ((3413, rng.uniform(50, 89.99, 500)),
                      (3031, rng.uniform(-89.99, -50, 500))):
        x, y = PROJ.polar_stereo_forward(lon, lat, epsg)
        lon2, lat2 = PROJ.polar_stereo_inverse(x, y, epsg)
        assert np.abs(lon2 - lon).max() < 1e-10
        assert np.abs(lat2 - lat).max() < 1e-10


def test_warp_df_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, float(-170 + i * 7), float(60 + i % 29)) for i in range(40)],
        "id long, lon double, lat double",
    )
    out = W.unwarp_from_polar(
        W.warp_to_polar(df, 3413).drop("lon", "lat"), 3413
    ).collect()
    for r in sorted(out, key=lambda r: r.id):
        assert r.lat == pytest.approx(60 + r.id % 29, abs=1e-9)


def test_pansharpen_weights(spark):
    # 4-band BGRN with reference weights: denom = .142b+.209g+.234r+.116n
    df = spark.createDataFrame([(200.0, [100.0, 100.0, 100.0, 100.0])],
                               "pan double, ms array<double>")
    out = df.select(W.pansharpen(F.col("pan"), F.col("ms"), n_bands=4).alias("o")).first().o
    denom = 100 * (0.142 + 0.209 + 0.234 + 0.116)
    assert out[0] == pytest.approx(100.0 * 200.0 / denom)
    # equal weights when band count unknown
    out2 = df.select(W.pansharpen(F.col("pan"), F.col("ms")).alias("o")).first().o
    assert out2[0] == pytest.approx(100.0 * 200.0 / 100.0)


def test_band_select_and_stack(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],)],
                               "ms array<double>")
    rgb = df.select(W.band_select(F.col("ms"), W.RGB_ORDER[8]).alias("o")).first().o
    assert rgb == [5.0, 3.0, 2.0]
    bgrn = df.select(W.band_select(F.col("ms"), W.BGRN_ORDER[8]).alias("o")).first().o
    assert bgrn == [2.0, 3.0, 5.0, 7.0]

    long_df = spark.createDataFrame(
        [("s1", 2, 20.0), ("s1", 1, 10.0), ("s1", 3, 30.0), ("s2", 1, 1.0)],
        "scene string, band int, value double",
    )
    stacked = {r.scene: r.bands for r in W.band_stack(long_df, ["scene"], "band", "value").collect()}
    assert stacked["s1"] == [10.0, 20.0, 30.0]
    assert stacked["s2"] == [1.0]


def test_union_footprint_agg(spark):
    rows = [
        ("g1", 0.0, 0.0, 10.0, 10.0),
        ("g1", 5.0, 0.0, 15.0, 10.0),   # overlaps -> union area 150
        ("g2", 0.0, 0.0, 1.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "cat string, s_xmin double, s_ymin double, "
                                     "s_xmax double, s_ymax double")
    out = {r.group_id: r for r in W.union_footprint_agg(df, "cat").collect()}
    assert out["g1"].union_area == pytest.approx(150.0)
    assert out["g2"].union_area == pytest.approx(1.0)
    assert "POLYGON" in out["g1"].bounds_wkt


# ---------------------------------------------------------------- UTM (R3)


def test_utm_meridian_arc_golden():
    """Snyder 3-21 series vs the published WGS84 quarter meridian."""
    import numpy as np

    from imagery_utils_spark.core import proj as P

    arc = P._meridian_arc(np.array([np.pi / 2]), P.WGS84)[0]
    assert arc == pytest.approx(10001965.7293, abs=1e-3)
    # equator -> 0, symmetry
    assert P._meridian_arc(np.array([0.0]), P.WGS84)[0] == 0.0


def test_utm_central_meridian_invariants():
    import numpy as np

    from imagery_utils_spark.core import proj as P

    # on the central meridian: easting exactly 500000, northing = k0 * arc
    x, y = P.utm_forward(np.array([3.0]), np.array([45.0]))  # zone 31, lon0=3
    assert x[0] == 500000.0
    arc = P._meridian_arc(np.radians(np.array([45.0])), P.WGS84)[0]
    assert y[0] / arc == pytest.approx(0.9996, abs=1e-15)
    # southern hemisphere false northing
    xs, ys = P.utm_forward(np.array([3.0]), np.array([-45.0]))
    assert ys[0] == pytest.approx(10000000.0 - y[0], abs=1e-6)


def test_utm_roundtrip_all_pickable_zones():
    """Forward+inverse < 1e-8 deg over random points in every zone the C5
    picker can choose, both hemispheres, WGS84 and NAD83/GRS80."""
    import numpy as np

    from imagery_utils_spark.core import proj as P

    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-60, 60, 5000)
    zone = P.utm_zone_from_lon(lon)
    x, y = P.utm_forward(lon, lat)
    for z in np.unique(zone):
        for s in (False, True):
            m = (zone == z) & ((lat < 0) == s)
            if not m.any():
                continue
            lo, la = P.utm_inverse(x[m], y[m], int(z), s)
            assert np.abs(lo - lon[m]).max() < 1e-8
            assert np.abs(la - lat[m]).max() < 1e-8
    # NAD83 (GRS80): zones 1-23 north only (scalar.get_epsg_from_lat_lon)
    x, y = P.utm_forward(np.array([-93.5]), np.array([44.9]),
                         zone=15, south=False, ellps=P.GRS80)
    lo, la = P.utm_inverse(x, y, 15, False, ellps=P.GRS80)
    assert abs(lo[0] + 93.5) < 1e-8 and abs(la[0] - 44.9) < 1e-8


def test_epsg_to_utm_matches_picker():
    from imagery_utils_spark.core import proj as P
    from imagery_utils_spark.functions.scalar import get_epsg_from_lat_lon

    for lat, lon in [(45.0, -93.0), (-33.9, 151.2), (0.0, -179.9), (59.9, 179.9)]:
        epsg = get_epsg_from_lat_lon(lat, lon)
        zone, south, _ = P.epsg_to_utm(epsg)
        assert zone == int(P.utm_zone_from_lon([lon])[0])
        assert south == (lat < 0)
    epsg83 = get_epsg_from_lat_lon(45.0, -93.0, utm_nad83=True)
    zone, south, ellps = P.epsg_to_utm(epsg83)
    assert (zone, south) == (15, False) and ellps is P.GRS80


def test_warp_to_utm_operator(spark):
    """DataFrame operator: auto per-row zone == numpy reference; explicit
    NAD83 epsg pins zone+ellipsoid; sql-template column == numpy to 1mm."""
    import numpy as np

    from imagery_utils_spark.core import proj as P
    from imagery_utils_spark.core.proj import utm_forward_sql
    from imagery_utils_spark.operators.warp import unwarp_from_utm, warp_to_utm

    pts = [(i, float(-177 + i * 7.9), float(-55 + i * 2.3)) for i in range(45)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    out = warp_to_utm(df).orderBy("id").collect()
    lon = np.array([p[1] for p in pts])
    lat = np.array([p[2] for p in pts])
    ex, ey = P.utm_forward(lon, lat)
    got_x = np.array([r.x for r in out])
    got_y = np.array([r.y for r in out])
    assert np.abs(got_x - ex).max() == 0.0
    assert np.abs(got_y - ey).max() == 0.0
    # sql template evaluates to the same values within the mm rounding
    xs, ys = utm_forward_sql("lon", "lat")
    sql_rows = df.selectExpr("id", f"{xs} AS x", f"{ys} AS y").orderBy("id").collect()
    assert np.abs(np.array([r.x for r in sql_rows]) - np.round(ex, 3)).max() <= 1e-9
    assert np.abs(np.array([r.y for r in sql_rows]) - np.round(ey, 3)).max() <= 1e-9
    # pinned-zone warp + unwarp round trip
    one = spark.createDataFrame([(1, -93.5, 44.9)], "id long, lon double, lat double")
    rt = unwarp_from_utm(
        warp_to_utm(one, epsg=26915).drop("lon", "lat"), epsg=26915
    ).first()
    assert abs(rt.lon + 93.5) < 1e-8 and abs(rt.lat - 44.9) < 1e-8
