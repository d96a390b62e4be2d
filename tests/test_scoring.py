"""Golden score parity with /root/reference/tests/test_mosaic_lib.py
(values cited per test). Fixture attribute values are those the reference
tests read from the imagery metadata."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.functions.scoring import ScoreParams, score_col

SCHEMA = (
    "sensor string, bands int, cloudcover double, sun_elev double, off_nadir double, "
    "tdi double, acq_time timestamp"
)


def _score(spark, row, params):
    df = spark.createDataFrame([row], SCHEMA)
    return df.select(
        score_col(
            params,
            cloudcover=F.col("cloudcover"),
            sun_elev=F.col("sun_elev"),
            off_nadir=F.col("off_nadir"),
            sensor=F.col("sensor"),
            bands=F.col("bands"),
            tdi=F.col("tdi"),
            acq_time=F.col("acq_time"),
        ).alias("score")
    ).first().score


def test_score_ge01(spark):
    # test_mosaic_lib.py:41 -> 79.1422222
    row = ("GE01", 1, 0.0, 45.98, 26.86, 8.0, datetime(2009, 7, 7, 16, 31, 15))
    assert _score(spark, row, ScoreParams(bands=1)) == pytest.approx(79.1422222, abs=1e-6)


def test_score_wv01(spark):
    # test_mosaic_lib.py:73 -> 79.2
    row = ("WV01", 1, 0.0, 39.0, 18.5, 16.0, datetime(2008, 8, 7, 15, 39, 45))
    assert _score(spark, row, ScoreParams(bands=1)) == pytest.approx(79.2, abs=1e-6)


def test_score_wv02_ndvi(spark):
    # test_mosaic_lib.py:106 -> 78.555555555
    row = ("WV02", 1, 0.0, 37.7, 19.4, 24.0, datetime(2011, 9, 1, 21, 4, 34))
    assert _score(spark, row, ScoreParams(bands=1)) == pytest.approx(78.555555555, abs=1e-6)


def test_score_wv01_tday_exposure(spark):
    # test_mosaic_lib.py:213 -> date_diff 24, score 86.0924408
    row = ("WV01", 1, 0.0, 39.0, 18.5, 16.0, datetime(2008, 8, 7, 15, 39, 45))
    params = ScoreParams(bands=1, tday="09-01", use_exposure=True)
    assert params.m == 9 and params.d == 1
    assert _score(spark, row, params) == pytest.approx(86.0924408, abs=1e-6)


def test_score_wv01_tyear(spark):
    # test_mosaic_lib.py:226 -> 134.2
    row = ("WV01", 1, 0.0, 39.0, 18.5, 16.0, datetime(2008, 8, 7, 15, 39, 45))
    assert _score(spark, row, ScoreParams(bands=1, tyear=2008)) == pytest.approx(134.2, abs=1e-6)


def test_score_wv01_tyear_tday(spark):
    # test_mosaic_lib.py:240 -> 90.6334244
    row = ("WV01", 1, 0.0, 39.0, 18.5, 16.0, datetime(2008, 8, 7, 15, 39, 45))
    params = ScoreParams(bands=1, tyear=2008, tday="09-01")
    assert _score(spark, row, params) == pytest.approx(90.6334244, abs=1e-6)


def test_score_cc_gate(spark):
    # test_mosaic_lib.py:265 -> -1 when cloudcover 0.29 > max_cc 0.20
    row = ("WV02", 1, 0.29, 39.2, 19.0, 48.0, datetime(2011, 5, 4, 15, 55, 51))
    assert _score(spark, row, ScoreParams(bands=1, max_cc=0.20)) == -1.0


def test_score_vantor(spark):
    # test_mosaic_lib.py:294 -> 77.2106667
    row = ("WV02", 8, 0.192, 66.0, 22.9, None, datetime(2021, 3, 13, 8, 44, 10))
    assert _score(spark, row, ScoreParams(bands=8)) == pytest.approx(77.2106667, abs=1e-6)


def test_score_gates(spark):
    params = ScoreParams(bands=1)
    # sun elevation < 2 -> -1 (lib/mosaic.py:634-637)
    row = ("WV01", 1, 0.0, 1.5, 18.5, 16.0, None)
    assert _score(spark, row, params) == -1.0
    # nonsense cloudcover clamps to max_cc, not gated (lib/mosaic.py:627-628)
    row = ("WV01", 1, 1.5, 39.0, 18.5, 16.0, None)
    s = _score(spark, row, params)
    expected = 48 * (1 - 0.5) + 28 * (39.0 / 90) + 24 * ((90 - 18.5) / 90)
    assert s == pytest.approx(expected, abs=1e-9)
    # missing required attribute -> -1 (lib/mosaic.py:513-519)
    row = ("WV01", 1, None, 39.0, 18.5, 16.0, None)
    assert _score(spark, row, params) == -1.0


def test_score_exposure_gate(spark):
    # WV01 pan threshold 1400 (lib/mosaic.py:538-544): tdi 64 * sunel 39 = 2496 > 1400
    row = ("WV01", 1, 0.0, 39.0, 18.5, 64.0, None)
    assert _score(spark, row, ScoreParams(bands=1, use_exposure=True)) == -1.0
    # without use_exposure the same row scores normally
    assert _score(spark, row, ScoreParams(bands=1)) == pytest.approx(79.2, abs=1e-6)
    # multi mosaic uses the multi thresholds (GE01: 170): 8*45.98=367.8 > 170 -> gated
    row = ("GE01", 4, 0.0, 45.98, 26.86, 8.0, None)
    assert _score(spark, row, ScoreParams(bands=4, use_exposure=True)) == -1.0


def test_score_panfactor(spark):
    # panfactor 0.5 iff 1-band image forced into multi mosaic (lib/mosaic.py:523-527)
    row = ("WV01", 1, 0.0, 39.0, 18.5, 16.0, None)
    s = _score(spark, row, ScoreParams(bands=4, force_pan_to_multi=True))
    assert s == pytest.approx(79.2 / 2, abs=1e-6)
    # multiband rows keep panfactor 1
    row = ("WV02", 4, 0.0, 39.0, 18.5, 16.0, None)
    s = _score(spark, row, ScoreParams(bands=4, force_pan_to_multi=True))
    assert s == pytest.approx(79.2, abs=1e-6)


def test_score_tday_acq_after_target(spark):
    # ADVICE r1: timedelta.days floors toward -inf BEFORE abs — acq AFTER the
    # target with a fractional day offset must ceil (date_diff 5, not 4).
    acq = datetime(2011, 9, 5, 14, 0, 0)
    expected_dd = min(
        abs((datetime(y, 9, 1) - acq).days) for y in (acq.year - 1, acq.year, acq.year + 1)
    )
    assert expected_dd == 5  # the direction the old floor(abs(.)) got wrong (4)
    row = ("WV02", 1, 0.0, 37.7, 19.4, 24.0, acq)
    expected = (
        30 * (1 - 0.0) + 10 * (37.7 / 90) + 5 * ((90 - 19.4) / 90.0)
        + 55 * ((183 - expected_dd) / 183.0)
    )
    assert _score(spark, row, ScoreParams(bands=1, tday="09-01")) == pytest.approx(
        expected, abs=1e-9
    )


def test_score_sql_parity_tday_both_directions(spark):
    """score_sql (DuckDB) == score_col (Spark) in tday mode for acquisitions
    before AND after the target date (the after direction regressed r1)."""
    import duckdb

    from imagery_utils_spark.functions.scoring import score_sql

    params = ScoreParams(bands=1, tday="09-01")
    rows = [
        ("WV01", 1, 0.0, 39.0, 18.5, None, datetime(2008, 8, 7, 15, 39, 45)),
        ("WV02", 1, 0.0, 37.7, 19.4, None, datetime(2011, 9, 5, 14, 0, 0)),
        ("WV02", 1, 0.1, 50.0, 10.0, None, datetime(2015, 9, 1, 0, 0, 0)),
        ("WV02", 1, 0.1, 50.0, 10.0, None, datetime(2015, 12, 31, 23, 59, 59)),
    ]
    got = [_score(spark, r, params) for r in rows]
    con = duckdb.connect()
    sql = score_sql(params)
    for r, g in zip(rows, got):
        o = con.execute(
            f"SELECT {sql} FROM (SELECT {r[2]} AS cloudcover, {r[3]} AS sun_elev, "
            f"{r[4]} AS off_nadir, TIMESTAMP '{r[6]}' AS acq_time)"
        ).fetchone()[0]
        assert g == pytest.approx(o, abs=1e-12), r
