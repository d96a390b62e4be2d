"""End-to-end ortho pipeline integration: the pgc_ortho flow
(/root/reference/pgc_ortho.py:243-357 scan -> filter -> process_image per
scene; lib/ortho_functions.py calc_stats -> LUT -> output naming -> XML
sidecar) composed from the engine's operators in ONE DataFrame plan:

    classify filename (F8) -> product-code gate (F6)
      -> calib factors via broadcast dim (C6, GE01 units rule)
      -> LUT stretch over a DN band (C8)
      -> output name (C14) -> XML metadata rendering (K5)

Asserts the chain stays JVM-side except the one declared Arrow UDF (the
per-pixel LUT), gates the expected rows, and pins a hand-computed golden.
"""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.functions.calib import (
    apply_lut_udf,
    calib_dim_df,
    dg_calib_cols,
    dg_calib_factors,
    stretch_lut_points,
)
from imagery_utils_spark.functions.filters import prod_code_gate
from imagery_utils_spark.functions.naming import classify_filename, output_name_col
from imagery_utils_spark.functions.scalar import calc_earth_sun_dist_col
from imagery_utils_spark.sources.sinks import render_xml_metadata


@pytest.fixture(scope="module")
def scenes(spark):
    rows = []
    for i in range(12):
        sat = ["wv02", "ge01"][i % 2]
        prod = ["p1bs", "m1bs", "p2as"][i % 3]  # p2as must be gated out
        srcfn = (f"{sat}_20190513{i:06d}_{i:016d}_12may{i:08d}"
                 f"-{prod}-{i:012d}_01_p001")
        rows.append((i, srcfn + ".ntf", 39.0 + i, 0.009 + 0.001 * (i % 2)))
    return spark.createDataFrame(
        rows, "scene_id long, srcfn string, sun_elev double, abscal double")


def test_ortho_chain_end_to_end(spark, scenes):
    acq = datetime(2011, 9, 1, 21, 4, 34)
    cls = scenes.select(
        "*", classify_filename(F.col("srcfn")).alias("cls")
    ).withColumn("sat", F.upper(F.col("cls.sat"))) \
     .withColumn("prod_code", F.col("cls.prod_code"))

    gated = cls.filter(prod_code_gate(F.col("prod_code")))
    # p2as rows (every third) rejected; the rest carry P1BS/M1BS
    assert gated.count() == 8

    dim = calib_dim_df(spark)
    band = F.when(F.col("prod_code").startswith("P"), "BAND_P").otherwise("BAND_B")
    joined = gated.withColumn("band", band).join(
        F.broadcast(dim),
        F.concat(F.col("sat"), F.lit("_"), F.col("band")) == F.col("satband"),
        "inner")
    units = F.when(
        (F.col("sat") == "GE01") & (F.col("band") == "BAND_P")
        & (F.col("abscal") < 0.01), 10.0).otherwise(1.0)
    des = calc_earth_sun_dist_col(F.lit(acq.isoformat()).cast("timestamp"))
    refl_fact, refl_off, _rad = dg_calib_cols(
        F.col("abscal"), F.lit(0.0625), F.col("esun"), F.col("gain"),
        F.col("bias"), des, F.col("sun_elev"), units)
    calibed = joined.withColumn("calfact", refl_fact).withColumn("caloff", refl_off)

    # LUT: 'rf' stretch breakpoints from driver-side factors for one golden
    # scene; per-pixel application through the Arrow UDF
    golden = dg_calib_factors(
        "WV02", {"BAND_P": (0.009, 0.0625)}, acq, 39.0, "rf")["BAND_P"]
    pts = stretch_lut_points("rf", golden[0], golden[1], imax=2047.0, omax=255.0)
    lut = apply_lut_udf(pts)
    dn = (F.col("scene_id") * 293 % 2048).cast("double")
    stretched = calibed.withColumn("dn", dn).withColumn("lut_out", lut(dn))

    named = stretched.withColumn(
        "outname",
        output_name_col(F.col("srcfn"), F.lit("u08"), F.lit("rf"),
                        F.lit(3413)))
    final = render_xml_metadata(
        named.withColumn("stretch", F.lit("rf")).withColumn("epsg", F.lit(3413)),
        name_col="outname", source_col="srcfn",
        keep=("scene_id", "sat", "band", "calfact", "caloff", "dn", "lut_out"))

    out = {r["scene_id"]: r for r in final.collect()}
    assert len(out) == 8

    # golden: scene 0 is WV02/p1bs/sun 39/abscal 0.009 — the exact factors
    # the driver-side reference arithmetic produces
    r0 = out[0]
    assert r0["calfact"] == pytest.approx(golden[0], rel=1e-12)
    assert r0["caloff"] == pytest.approx(golden[1], rel=1e-12)
    # LUT endpoints: dn=0 -> offset*omax
    assert r0["dn"] == 0.0
    assert r0["lut_out"] == pytest.approx(golden[1] * 255.0, rel=1e-12)
    # GE01 pan scene: reference arithmetic with the row's own attrs. The
    # fixture abscal is 0.009 + 0.001 = 0.00999...8 in floats — BELOW the
    # 0.01 pan threshold, so the x10 units rule fires in BOTH forms (the
    # exact boundary float, a genuinely adversarial case for the rule).
    ge = next(r for r in out.values() if r["sat"] == "GE01" and r["band"] == "BAND_P")
    factors_ge = dg_calib_factors(
        "GE01", {"BAND_P": (0.009 + 0.001, 0.0625)}, acq,
        39.0 + ge["scene_id"], "rf")["BAND_P"]
    assert ge["calfact"] == pytest.approx(factors_ge[0], rel=1e-12)
    # naming + xml contracts
    assert r0["outname"].endswith("_u08rf3413.tif")
    assert r0["xml"].startswith('<output name="wv02_20190513')
    assert "</source><params stretch=\"rf\" epsg=\"3413\"/>" in r0["xml"]


def test_ortho_chain_single_arrow_udf(spark, scenes):
    """The only Python in the plan is the declared per-pixel LUT UDF."""
    pts = stretch_lut_points("ns", 1.0, 0.0, imax=255.0, omax=255.0)
    dn = (F.col("scene_id") % 256).cast("double")
    df = scenes.select(
        "*", classify_filename(F.col("srcfn")).alias("cls")
    ).filter(prod_code_gate(F.col("cls.prod_code"))) \
     .withColumn("lut_out", apply_lut_udf(pts)(dn)) \
     .withColumn("outname", output_name_col(
         F.col("srcfn"), F.lit("u08"), F.lit("ns"), F.lit(4326)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
