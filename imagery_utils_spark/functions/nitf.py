"""NITF metadata carry-over for IKONOS band stacking (R7 residual).

The reference's ``stack_ik_bands`` (/root/reference/lib/ortho_functions.py:
1054-1159) merges four single-band IKONOS NITF files into one multi-band
NITF via ``gdal_translate -of NITF``, carrying the source NITF metadata
dictionary over with these exact rules:

* drop the keys GDAL must own on the output: NITF_FHDR, NITF_IREP,
  NITF_OSTAID, NITF_IC, NITF_ICORDS, NITF_IGEOLO, IREPBAND
  (remove_keys, :1060);
* drop any entry whose value contains a double-quote (it cannot ride a
  ``-co "K=V"`` shell token, :1091 / :1100);
* strip the ``NITF_`` prefix from the surviving keys (:1092);
* emit in sorted key order (:1089-1090);
* then force ``IREP=MULTI`` (meta_dict, :1061) — the stacked image is
  multi-band;
* band color interpretation on the stacked output: 1=blue, 2=green,
  3=red, 4=undefined (band_dict, :1056-1059).

The pixel side of the stack is operators.warp.band_stack (R7); this module
is the metadata side, as pure column algebra over (key, value) entry rows
— no UDF, SQL-expressible for the oracle. TRE entries follow the same
quote rule with no prefix strip and no removals (:1102-1106), modeled by
``carry=False``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NITF_REMOVE_KEYS = ("NITF_FHDR", "NITF_IREP", "NITF_OSTAID", "NITF_IC",
                    "NITF_ICORDS", "NITF_IGEOLO", "IREPBAND")
NITF_FORCED = (("IREP", "MULTI"),)
IK_BAND_INTERP = {1: "blue", 2: "green", 3: "red", 4: "undefined"}


def stack_ik_meta(entries: DataFrame, group_col: str = "doc_id",
                  key_col: str = "meta_key",
                  val_col: str = "meta_value") -> DataFrame:
    """(group, key, value) metadata entries of the source blue-band image ->
    the carried-over creation-option entries of the stacked NITF: removals,
    quote filter, NITF_ prefix strip, forced IREP=MULTI, sorted key order
    (``opt_order`` is the 1-based position in the -co list the reference
    builds). Pure column algebra; one shuffle (the per-group sort)."""
    kept = entries.filter(
        ~F.col(key_col).isin(*NITF_REMOVE_KEYS)
        & ~F.col(val_col).contains('"')
    ).select(
        F.col(group_col),
        F.regexp_replace(F.col(key_col), "^NITF_", "").alias("opt_key"),
        F.col(val_col).alias("opt_value"),
        F.lit(0).alias("_forced"),
    )
    forced = entries.select(group_col).distinct().select(
        F.col(group_col),
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("opt_key"), F.lit(v).alias("opt_value"))
            for k, v in NITF_FORCED])).alias("_f"),
    ).select(group_col, "_f.opt_key", "_f.opt_value", F.lit(1).alias("_forced"))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("_forced", "opt_key")
    return (
        kept.unionByName(forced)
        .withColumn("opt_order", F.row_number().over(w))
        .drop("_forced")
    )


def tre_meta(entries: DataFrame, group_col: str = "doc_id",
             key_col: str = "tre_key", val_col: str = "tre_value") -> DataFrame:
    """TRE carry-over: quote filter only, rendered as TRE=K=V options
    (ortho_functions.py:1102-1106)."""
    return entries.filter(~F.col(val_col).contains('"')).select(
        F.col(group_col), F.col(key_col).alias("tre_key"),
        F.concat(F.lit("TRE="), F.col(key_col), F.lit("="),
                 F.col(val_col)).alias("tre_option"),
    )


def ik_band_interp_col(band_idx: Column) -> Column:
    """Color interpretation of stacked-IKONOS band i (band_dict,
    ortho_functions.py:1056-1059)."""
    expr = F.lit(None).cast("string")
    for i, name in sorted(IK_BAND_INTERP.items(), reverse=True):
        expr = F.when(band_idx == i, F.lit(name)).otherwise(expr)
    return expr
