"""RPC00B rational-polynomial model (R3 terrain-correction residual).

The reference's terrain correction is `gdalwarp -rpc` (ortho_functions.py:
1878-1932); these tests pin the from-spec reimplementation: forward
column algebra == numpy kernel bit-exact, SQL twin == numpy bit-exact
(DuckDB), Newton inverse roundtrips to sub-ulp normalized error, and a
closed-form golden for a degenerate linear model.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.core import rpc as R
from imagery_utils_spark.operators.warp import ground_points, ortho_points


@pytest.fixture(scope="module")
def model():
    return R.demo_model()


def _grid(n=200, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-0.5, 0.5, n)
    lat = rng.uniform(-0.5, 0.5, n)
    h = rng.uniform(-384.0, 512.0, n)
    return lon, lat, h


def test_forward_linear_golden():
    # line_num = P only, den = 1 => line = ((lat-off)/scale)*line_scale+line_off
    m = R.RPCModel(
        lat_off=1.0, lat_scale=2.0, lon_off=0.0, lon_scale=1.0,
        height_off=0.0, height_scale=1.0,
        line_off=100.0, line_scale=50.0, samp_off=200.0, samp_scale=10.0,
        line_num=(0.0, 0.0, 1.0) + (0.0,) * 17,
        line_den=(1.0,) + (0.0,) * 19,
        samp_num=(0.0, 1.0) + (0.0,) * 18,
        samp_den=(1.0,) + (0.0,) * 19,
    )
    line, samp = R.rpc_forward_np(m, [3.0], [5.0], [0.0])
    assert line[0] == (5.0 - 1.0) / 2.0 * 50.0 + 100.0
    assert samp[0] == 3.0 * 10.0 + 200.0


def test_forward_column_matches_numpy_bitexact(spark, model):
    lon, lat, h = _grid()
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(lon, lat, h)],
        "lon double, lat double, height double")
    out = ortho_points(df, model).select("lon", "line", "samp").collect()
    el, es = R.rpc_forward_np(model, lon, lat, h)
    got = {r.lon: (r.line, r.samp) for r in out}
    for i, lo in enumerate(lon):
        gl, gs = got[float(lo)]
        assert gl == el[i] and gs == es[i]  # bit-exact


def test_forward_sql_matches_numpy_bitexact(model):
    lon, lat, h = _grid(seed=11)
    con = duckdb.connect()
    # e-notation literals: DuckDB types bare decimal tokens DECIMAL(19,18)
    # and decimal-rounds them before any CAST (1-ulp double-rounding);
    # e-notation is typed DOUBLE and parses correctly rounded
    con.execute("CREATE TABLE g AS SELECT * FROM (VALUES "
                + ",".join("({:.17e},{:.17e},{:.17e})".format(
                    float(a), float(b), float(c))
                    for a, b, c in zip(lon, lat, h))
                + ") t(lon, lat, height)")
    le, se = R.rpc_forward_sql(model, "lon", "lat", "height")
    rows = con.execute(f"SELECT {le} AS l, {se} AS s FROM g").fetchall()
    el, es = R.rpc_forward_np(model, lon, lat, h)
    for i, (gl, gs) in enumerate(rows):
        assert gl == el[i] and gs == es[i]  # bit-exact across engines


def test_inverse_roundtrip(model):
    lon, lat, h = _grid(seed=13)
    line, samp = R.rpc_forward_np(model, lon, lat, h)
    rlon, rlat = R.rpc_inverse_np(model, line, samp, h)
    assert np.max(np.abs(rlon - lon)) < 1e-9
    assert np.max(np.abs(rlat - lat)) < 1e-9
    # and forward again: image-space error far below a pixel
    l2, s2 = R.rpc_forward_np(model, rlon, rlat, h)
    assert np.max(np.abs(l2 - line)) < 1e-6
    assert np.max(np.abs(s2 - samp)) < 1e-6


def test_ground_points_operator_roundtrip(spark, model):
    lon, lat, h = _grid(n=64, seed=17)
    line, samp = R.rpc_forward_np(model, lon, lat, h)
    df = spark.createDataFrame(
        [(int(i), float(a), float(b), float(c))
         for i, (a, b, c) in enumerate(zip(line, samp, h))],
        "pid int, line double, samp double, height double")
    out = ground_points(df, model).orderBy("pid").collect()
    assert np.max(np.abs(np.array([r.lon for r in out]) - lon)) < 1e-9
    assert np.max(np.abs(np.array([r.lat for r in out]) - lat)) < 1e-9


def test_height_sensitivity(model):
    # terrain height must move the image point (the whole point of -rpc with
    # a DEM): same ground point at two heights lands on different line/samp
    l0, s0 = R.rpc_forward_np(model, [0.25], [0.25], [0.0])
    l1, s1 = R.rpc_forward_np(model, [0.25], [0.25], [400.0])
    assert abs(l1[0] - l0[0]) > 1.0 or abs(s1[0] - s0[0]) > 1.0
