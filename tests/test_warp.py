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
