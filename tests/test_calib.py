"""Calibration parity checks: factor shapes/ranges per the reference test
philosophy (/root/reference/tests/test_ortho_functions.py:59-70 asserts
factors fall in valid numeric ranges) + exact-arithmetic self-consistency."""

import math
from datetime import datetime

import numpy as np
import pytest

from imagery_utils_spark.functions import calib
from imagery_utils_spark.functions.scalar import calc_earth_sun_dist


ACQ = datetime(2011, 9, 1, 21, 4, 34)
WV02_BANDS = {"BAND_B": (0.0134, 0.0543), "BAND_G": (0.0096, 0.0630),
              "BAND_R": (0.0111, 0.0574), "BAND_N": (0.0120, 0.0989)}


def test_reflectance_factors_in_range():
    out = calib.dg_calib_factors("WV02", WV02_BANDS, ACQ, sun_elev=37.7, stretch="rf")
    assert set(out) == set(WV02_BANDS)
    for band, (fact, off) in out.items():
        assert 0 < fact < 1, band          # typical refl factors are tiny
        assert off < 0                      # negative bias-driven offset


def test_radiance_factors():
    out = calib.dg_calib_factors("WV02", WV02_BANDS, ACQ, sun_elev=37.7, stretch="rd")
    # rd: (units*gain*abscal/effbandw, bias) exactly
    f, off = out["BAND_B"]
    assert f == pytest.approx(1.002 * 0.0134 / 0.0543, rel=1e-12)
    assert off == -9.835


def test_exact_reflectance_formula():
    des = calc_earth_sun_dist(ACQ)
    out = calib.dg_calib_factors("WV02", {"BAND_G": (0.0096, 0.0630)}, ACQ, 37.7)
    f, off = out["BAND_G"]
    exp = (0.953 * 0.0096 * des ** 2 * math.pi) / (
        1829.62 * math.cos(math.radians(90 - 37.7)) * 0.0630
    )
    assert f == pytest.approx(exp, rel=1e-14)


def test_ge01_units_factor():
    # GE01 abscal_B below 0.004 triggers the x10 units shift (:2262-2267)
    low = calib.dg_calib_factors("GE01", {"BAND_B": (0.003, 0.05)}, ACQ, 45.0, "rd")
    high = calib.dg_calib_factors("GE01", {"BAND_B": (0.03, 0.05)}, ACQ, 45.0, "rd")
    assert low["BAND_B"][0] == pytest.approx(10 * 1.041 * 0.003 / 0.05, rel=1e-12)
    assert high["BAND_B"][0] == pytest.approx(1.041 * 0.03 / 0.05, rel=1e-12)


def test_negative_sun_elev_raises():
    # golden behavior: tests/test_ortho_functions.py:381-397
    with pytest.raises(calib.InvalidSunElevation):
        calib.dg_calib_factors("WV01", {"BAND_P": (0.06, 0.4)}, ACQ, sun_elev=-5.0)
    # but 'ns' stretch allows it
    out = calib.dg_calib_factors("WV01", {"BAND_P": (0.06, 0.4)}, ACQ, -5.0, "ns")
    assert "BAND_P" in out


def test_unknown_band_skipped():
    out = calib.dg_calib_factors("WV01", {"BAND_Z": (0.06, 0.4)}, ACQ, 45.0)
    assert out == {}


def test_lut_stretches():
    pts_ns = calib.stretch_lut_points("ns", 0, 0, imax=2047, omax=255)
    assert pts_ns == [(0.0, 0.0), (2047, 255)]
    pts_rf = calib.stretch_lut_points("rf", 0.0002, -0.01, imax=2047, omax=2000)
    assert pts_rf[0] == (0.0, -0.01 * 2000)
    assert pts_rf[1][1] == pytest.approx((2047 * 0.0002 - 0.01) * 2000)
    # mr: breakpoints are the inverse-reflectance DNs of the 6-point curve
    pts_mr = calib.stretch_lut_points("mr", 0.0002, -0.01, imax=2047, omax=255)
    assert len(pts_mr) == 6
    assert pts_mr[0][0] == pytest.approx((0 - (-0.01)) / 0.0002)
    assert pts_mr[-1][1] == 255


def test_ik_coefficient_break():
    # pre/post 2001-02-22 coefficient tables (ortho_functions.py:2321-2326)
    pre = calib.ik_calib_factors(datetime(2001, 2, 21), 45.0, "rd")
    post = calib.ik_calib_factors(datetime(2001, 2, 23), 45.0, "rd")
    assert pre[0][0] == pytest.approx(10000.0 / (633 * 71.3))
    assert post[0][0] == pytest.approx(10000.0 / (728 * 71.3))
    assert pre[4][0] == post[4][0]  # pan coefficient identical across break


def test_ge_calib():
    out = calib.ge_calib_factors(datetime(2009, 11, 1, 1, 49, 33), 45.98,
                                 gains={1: 1.2, 4: 0.9}, stretch="rd")
    assert out[1] == (12.0, 0)   # gain * 10
    assert out[4] == (9.0, 0)
    refl = calib.ge_calib_factors(datetime(2009, 11, 1, 1, 49, 33), 45.98,
                                  gains={1: 1.2})
    des = calc_earth_sun_dist(datetime(2009, 11, 1, 1, 49, 33))
    exp = (1.2 * des ** 2 * math.pi) / (196.0 * math.cos(math.radians(90 - 45.98)))
    assert refl[1][0] == pytest.approx(exp, rel=1e-14)


def test_apply_lut_interp():
    pts = [(0.0, 0.0), (100.0, 1000.0)]
    out = calib.apply_lut(np.asarray([0, 50, 100, 150]), pts)
    assert list(out) == [0.0, 500.0, 1000.0, 1000.0]  # clamped above imax


def test_full_table_coverage_and_corrections():
    """Round-2 completion: every sensor/band of the reference tables
    (lib/ortho_functions.py:62-306) is present, including WV03 SWIR/CAVIS and
    Legion LG01/LG02; r1's wrong GE01 gains / zero IK01 biases corrected."""
    assert len(calib.ESUN) == len(calib.GAIN) == len(calib.BIAS) == 72
    assert calib.ESUN["WV03_BAND_S1"] == 479.019
    assert calib.GAIN["WV03_BAND_CRS"] == 1.0
    assert calib.ESUN["LG02_BAND_RE2"] == 1292.678
    assert calib.GAIN["GE01_BAND_P"] == 1.001  # was 0.970 in r1
    assert calib.BIAS["IK01_BAND_N"] == -8.869  # was 0.0 in r1
    # unknown sensor degrades explicitly: band simply absent, no KeyError
    out = calib.dg_calib_factors("XX99", {"BAND_P": (0.06, 0.4)}, ACQ, 45.0)
    assert out == {}


def test_dg_calib_cols_matches_dict_form(spark):
    """The broadcast-dim column form must agree with the driver-side dict
    form (same reference arithmetic; des**2 vs des*des differ below 1e-15
    relative)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from imagery_utils_spark.functions.scalar import calc_earth_sun_dist_col

    acq = datetime(2011, 9, 1, 21, 4, 34)
    sun_elev = 39.2
    rows = []
    for sat, bands in (("WV02", WV02_BANDS),
                       ("GE01", {"BAND_B": (0.003, 0.054),
                                 "BAND_P": (0.009, 0.403)})):
        expected = calib.dg_calib_factors(sat, bands, acq, sun_elev, "rf")
        for band, (abscal, effbandw) in bands.items():
            rows.append((sat, band, abscal, effbandw,
                         expected[band][0], expected[band][1]))
    df = spark.createDataFrame(
        rows, "sat string, band string, abscal double, effbandw double, "
              "exp_fact double, exp_off double")
    dim = calib.calib_dim_df(spark)
    joined = df.join(
        F.broadcast(dim),
        F.concat(F.col("sat"), F.lit("_"), F.col("band")) == F.col("satband"))
    # GE01 fixture: abscal_B=0.003 < 0.004 -> units 10 (both bands; the
    # reference applies the scene-level rescale to every band)
    units = F.when(F.col("sat") == "GE01", 10.0).otherwise(1.0)
    des = calc_earth_sun_dist_col(F.lit(acq.isoformat()).cast("timestamp"))
    fact, off, _rad = calib.dg_calib_cols(
        F.col("abscal"), F.col("effbandw"), F.col("esun"), F.col("gain"),
        F.col("bias"), des, F.lit(sun_elev), units)
    out = joined.select("exp_fact", "exp_off", fact.alias("fact"),
                        off.alias("off")).collect()
    assert len(out) == 6
    for r in out:
        assert r["fact"] == pytest.approx(r["exp_fact"], rel=1e-12)
        assert r["off"] == pytest.approx(r["exp_off"], rel=1e-12)


def test_ik_calib_cols_break_parity(spark):
    """Column form picks pre/post coefficients by acquisition date exactly
    like ik_calib_factors."""
    from datetime import datetime

    from pyspark.sql import functions as F

    for acq in (datetime(2000, 6, 1), datetime(2003, 6, 1)):
        expected_rf = calib.ik_calib_factors(acq, 25.0, "rf")
        expected_rd = calib.ik_calib_factors(acq, 25.0, "rd")
        dim = calib.ik_calib_dim_df(spark)
        refl, rad = calib.ik_calib_cols(
            F.lit(acq.isoformat()).cast("timestamp"), F.lit(25.0),
            F.col("esun"), F.col("bandwidth"),
            F.col("cal_pre"), F.col("cal_post"))
        out = {r["band_idx"]: (r["refl"], r["rad"]) for r in
               dim.select("band_idx", refl.alias("refl"),
                          rad.alias("rad")).collect()}
        for band in range(5):
            assert out[band][0] == pytest.approx(expected_rf[band][0], rel=1e-12)
            assert out[band][1] == pytest.approx(expected_rd[band][0], rel=1e-12)
