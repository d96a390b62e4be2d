"""Filename-regex classification + pan-id derivation (F8/C13/C14/C17).

Faithful reimplementation of ``get_sensor`` (/root/reference/lib/utils.py:122-201):
eight regex signatures tried in vendor order DG -> GE -> IK over the
lowercased filename; first match wins. And of the pan<->multi scene-id string
rules (/root/reference/lib/mosaic.py:180-197) with the -1 s timestamp retry
key (/root/reference/lib/mosaic.py:65-85).

All of this is pure column algebra (``regexp_extract`` cascades + ``coalesce``)
— no UDF, JVM-side, and exactly the Spark mapping SURVEY.md §2 F8 calls for.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Signatures verbatim from /root/reference/lib/utils.py:123-136 (named groups
# become positional for regexp_extract; group indices noted inline).
RAW_DG = r"(\d{2}[a-z]{3}\d{8})-([a-z0-9]{4})_?(r\d+c\d+)?-(\d{12}_\d{2})_(p\d{3})"
RENAMED_DG = (r"([a-z]{2}\d{2})_(\d{14})_([a-f0-9]{16})_"
              r"(\d{2}[a-z]{3}\d{8})-([a-z0-9]{4})_?(r\d+c\d+)?-(\d{12}_\d{2})_(p\d{3})")
RENAMED_DG2 = r"(\w\w\d\d)_(\d\d[a-z]{3}\d{9})-([a-z0-9]{4})_?(r\d+c\d+)?-([a-z0-9]{16})"
RAW_GE = (r"(\d[a-z])(\d{6})([a-z])(\d{9})(\d[a-z])(\d{3})(\d{8})(\d)([a-z0-9])_"
          r"(\d{8,9})")
RENAMED_GE = r"(\w\w\d\d)_(\d{6})(\w)(\d{9})(\d\w)(\d{3})(\d{8})(\d)(\w)_(\d{8,9})"
RAW_IK = r"po_(\d{5,7})_([a-z]+)_(\d+)?"
RENAMED_IK = r"([a-z]{2}\d\d)_(\d{28})_([a-z]+)_(\d{4}[ns])"
RENAMED_IK2 = (r"([a-z]{2}\d{2})_(\d{14})_(\d{28})_po_(\d{5,7})_"
               r"([a-z]+(?=_))?_?(\d{7}(?=[_.]))?")


def _x(src: Column, pattern: str, group: int) -> Column:
    """regexp_extract returning NULL (not '') on miss."""
    v = F.regexp_extract(src, pattern, group)
    return F.when(v != "", v)


def classify_filename(srcfn: Column) -> Column:
    """Struct (vendor, sat, prod_code, band, tile) — first-match-wins cascade
    in the reference's trial order (DG patterns, then GE, then IK)."""
    s = F.lower(srcfn)

    # DG: RENAMED_DG -> RENAMED_DG2 -> RAW_DG (lib/utils.py:138, 157-170)
    dg_sat = F.coalesce(
        F.upper(_x(s, RENAMED_DG, 1)),
        F.upper(_x(s, RENAMED_DG2, 1)),
        F.when(_x(s, RAW_DG, 2).isNotNull(), F.lit(None).cast("string")),
    )
    dg_prod = F.coalesce(
        F.upper(_x(s, RENAMED_DG, 5)),
        F.upper(_x(s, RENAMED_DG2, 3)),
        F.upper(_x(s, RAW_DG, 2)),
    )
    dg_tile = F.coalesce(
        F.upper(_x(s, RENAMED_DG, 6)),
        F.upper(_x(s, RENAMED_DG2, 4)),
        F.upper(_x(s, RAW_DG, 3)),
    )
    is_dg = dg_prod.isNotNull()

    # GE: RENAMED_GE -> RAW_GE (band group 3 in both)
    ge_band = F.coalesce(F.upper(_x(s, RENAMED_GE, 3)), F.upper(_x(s, RAW_GE, 3)))
    is_ge = ge_band.isNotNull()

    # IK: RENAMED_IK -> RENAMED_IK2 -> RAW_IK (vendor recorded as GE,
    # sat IK01 — lib/utils.py:186-196)
    ik_band = F.coalesce(
        F.upper(_x(s, RENAMED_IK, 3)),
        F.upper(_x(s, RENAMED_IK2, 5)),
        F.upper(_x(s, RAW_IK, 2)),
    )
    is_ik = ik_band.isNotNull()

    vendor = (
        F.when(is_dg, F.lit("DigitalGlobe"))
        .when(is_ge | is_ik, F.lit("GeoEye"))
    )
    sat = (
        F.when(is_dg, dg_sat)
        .when(is_ge, F.lit("GE01"))
        .when(is_ik, F.lit("IK01"))
    )
    prod_code = F.when(is_dg, dg_prod)
    band = F.when(is_dg, F.lit(None).cast("string")).when(is_ge, ge_band).when(is_ik, ik_band)
    tile = F.when(is_dg, dg_tile)
    return F.struct(
        vendor.alias("vendor"), sat.alias("sat"), prod_code.alias("prod_code"),
        band.alias("band"), tile.alias("tile"),
    )


def pan_scene_id_col(scene_id: Column, sensor: Column, spec_type: Column) -> Column:
    """C13 — derive the panchromatic partner id
    (/root/reference/lib/mosaic.py:180-197). Note the reference's IK branch
    overwrites: only the LAST replace (bgrn->pan) sticks unless 'msi' matched
    in the second statement; replicated faithfully: replace('msi') result is
    reassigned, then replace('bgrn') applies to the *original* id via the
    final assignment chain — net effect: msi-replacement then bgrn applied to
    the msi result? No: each statement starts from self.scene_id, so the last
    statement wins. We mirror the net observable: bgrn->pan if present, else
    the id with msi untouched (the reference bug), else blu untouched."""
    mul = spec_type == "Multispectral"
    dg = sensor.isin("WV02", "WV03", "QB02")
    ge = sensor == "GE01"
    ik = sensor == "IK01"
    ge_5v = ge & scene_id.contains("_5V")
    # reference: self.pan_scene_id = scene_id.replace("msi","pan") then
    # immediately overwritten by scene_id.replace("bgrn","pan")
    ik_pan = F.regexp_replace(scene_id, "bgrn", "pan")
    return (
        F.when(~mul, scene_id)
        .when(dg, F.regexp_replace(scene_id, "-M", "-P"))
        .when(ge_5v, F.regexp_replace(scene_id, "M0", "P0"))
        .when(ge, F.regexp_replace(scene_id, "-M", "-P"))
        .when(ik, ik_pan)
        .otherwise(scene_id)
    )


def pan_scene_id_minus_1s_col(pan_scene_id: Column) -> Column:
    """C13/J4 retry key — the pan id with both embedded timestamps shifted
    -1 s (/root/reference/lib/mosaic.py:65-85): chars [5:19] hold
    %Y%m%d%H%M%S; the second stamp is %y%b%d%H%M%S uppercased."""
    ts = F.to_timestamp(pan_scene_id.substr(6, 14), "yyyyMMddHHmmss")
    ts1 = F.timestamp_seconds(F.unix_timestamp(ts) - 1)
    form1 = F.date_format(ts, "yyyyMMddHHmmss")
    form1_d = F.date_format(ts1, "yyyyMMddHHmmss")
    form2 = F.upper(F.date_format(ts, "yyMMMddHHmmss"))
    form2_d = F.upper(F.date_format(ts1, "yyMMMddHHmmss"))
    out = F.replace(pan_scene_id, form1, form1_d)
    return F.replace(out, form2, form2_d)


def output_name_col(srcfn: Column, bitdepth: Column, stretch: Column,
                    epsg: Column, pansh: bool = False, ext: str = ".tif") -> Column:
    """C14 — ``{src}_{bitdepth}{stretch}{epsg}[_pansh]{ext}``
    (/root/reference/lib/ortho_functions.py:446-453)."""
    suffix = F.concat(bitdepth, stretch, epsg.cast("string"))
    name = F.concat(srcfn, F.lit("_"), suffix)
    if pansh:
        name = F.concat(name, F.lit("_pansh"))
    return F.concat(name, F.lit(ext))
