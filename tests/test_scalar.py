"""Golden-value parity with the reference helpers
(/root/reference/tests/test_mosaic_lib.py:377-401,
 /root/reference/tests/test_ortho_functions.py:368-379)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.functions import scalar


def test_buffernum():
    assert scalar.buffernum(10, 5) == "00010"
    assert scalar.buffernum(5, 2) == "05"
    assert scalar.buffernum(123, 2) == "123"


def test_drange():
    assert list(scalar.drange(0, 5, 1)) == [0, 1, 2, 3, 4]
    assert list(scalar.drange(5, 0, 1)) == []


def test_pl2xy():
    assert scalar.pl2xy([0, 50, 10, 1000, 5, 50], 10, 10) == (500, 1525.0)
    assert scalar.pl2xy([-50, 50, 10, 1000, 5, 50], 10, 10) == (450, 1525.0)


def test_earth_sun_dist():
    d = scalar.calc_earth_sun_dist(datetime(2010, 10, 20, 10, 20, 10))
    assert d == pytest.approx(0.9957508611980816, abs=1e-12)


@pytest.mark.parametrize(
    "lat,lon,mode,expected",
    [
        (45.0, -93.0, "auto", 32615),
        (-45.0, -93.0, "auto", 32715),
        (61.0, -93.0, "auto", 3413),
        (-61.0, -93.0, "auto", 3031),
        (75.0, 10.0, "utm", 32632),
        (0.0, -180.0, "auto", 32601),
        (0.0, 180.0, "auto", 32660),
    ],
)
def test_epsg(lat, lon, mode, expected):
    assert scalar.get_epsg_from_lat_lon(lat, lon, mode) == expected


def test_epsg_nad83():
    assert scalar.get_epsg_from_lat_lon(45.0, -93.0, "utm", utm_nad83=True) == 26915
    with pytest.raises(ValueError):
        scalar.get_epsg_from_lat_lon(-45.0, -93.0, "utm", utm_nad83=True)
    with pytest.raises(ValueError):
        scalar.get_epsg_from_lat_lon(45.0, 40.0, "utm", utm_nad83=True)  # zone 37 > 23


def test_column_forms(spark):
    df = spark.createDataFrame(
        [(10, 5, 45.0, -93.0, datetime(2010, 10, 20, 10, 20, 10))],
        "num int, buf int, lat double, lon double, ts timestamp",
    )
    row = df.select(
        scalar.buffernum_col(F.col("num"), 5).alias("b"),
        scalar.epsg_col(F.col("lat"), F.col("lon")).alias("e"),
        scalar.calc_earth_sun_dist_col(F.col("ts")).alias("d"),
        scalar.drange_col(F.lit(0.0), F.lit(5.0), F.lit(1.0)).alias("r"),
        scalar.drange_col(F.lit(5.0), F.lit(0.0), F.lit(1.0)).alias("r0"),
    ).first()
    assert row.b == "00010"
    assert row.e == 32615
    assert row.d == pytest.approx(0.9957508611980816, abs=1e-12)
    assert row.r == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert row.r0 == []


def test_drange_col_float_accumulation_parity(spark):
    # drange(0,1,0.1) accumulates 11 values ending 0.9999999999999999 —
    # index arithmetic (start + i*step) would give 10; the column form must
    # match the reference loop element-for-element (ADVICE r1).
    expected = list(scalar.drange(0.0, 1.0, 0.1))
    assert len(expected) == 11 and expected[-1] == 0.9999999999999999
    row = spark.range(1).select(
        scalar.drange_col(F.lit(0.0), F.lit(1.0), F.lit(0.1)).alias("r")
    ).first()
    assert row.r == expected
