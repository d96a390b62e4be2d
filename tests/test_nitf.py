"""stack_ik_bands metadata carry-over (ortho_functions.py:1054-1106)."""

from pyspark.sql import functions as F

from imagery_utils_spark.functions.nitf import (
    ik_band_interp_col,
    stack_ik_meta,
    tre_meta,
)


def test_stack_ik_meta_rules(spark):
    entries = spark.createDataFrame(
        [
            (1, "NITF_FHDR", "NITF02.10"),      # removed (owned by GDAL)
            (1, "NITF_IREP", "MONO"),           # removed, then forced MULTI
            (1, "NITF_ICORDS", "G"),            # removed
            (1, "NITF_ABPP", "11"),             # kept -> ABPP
            (1, "NITF_FTITLE", 'po_"x"'),       # dropped (quote in value)
            (1, "ACQDATE", "20080801"),         # kept, no prefix to strip
            (2, "NITF_OSTAID", "GDAL"),         # removed
            (2, "NITF_ISORCE", "IKONOS"),       # kept -> ISORCE
        ],
        "doc_id int, meta_key string, meta_value string",
    )
    out = stack_ik_meta(entries)
    rows = {(r.doc_id, r.opt_key): (r.opt_value, r.opt_order)
            for r in out.collect()}
    # doc 1: sorted kept keys ABPP, ACQDATE then forced IREP last
    assert rows[(1, "ABPP")] == ("11", 1)
    assert rows[(1, "ACQDATE")] == ("20080801", 2)
    assert rows[(1, "IREP")] == ("MULTI", 3)
    assert (1, "FTITLE") not in rows and (1, "FHDR") not in rows
    assert (1, "ICORDS") not in rows
    # doc 2: ISORCE then forced IREP
    assert rows[(2, "ISORCE")] == ("IKONOS", 1)
    assert rows[(2, "IREP")] == ("MULTI", 2)


def test_tre_meta_quote_filter(spark):
    entries = spark.createDataFrame(
        [(1, "ICHIPB", "0098"), (1, "BAD", 'x"y')],
        "doc_id int, tre_key string, tre_value string",
    )
    out = {r.tre_key: r.tre_option for r in tre_meta(entries).collect()}
    assert out == {"ICHIPB": "TRE=ICHIPB=0098"}


def test_ik_band_interp(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 6)], "band_idx int")
    got = {r.band_idx: r.interp for r in df.select(
        "band_idx", ik_band_interp_col(F.col("band_idx")).alias("interp")
    ).collect()}
    assert got == {1: "blue", 2: "green", 3: "red", 4: "undefined", 5: None}
