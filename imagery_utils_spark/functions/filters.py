"""Attribute filters and parsers (F1/F6/F9/C12/C16) — pure column algebra.

* F1 — ``filterMatchingImages`` (/root/reference/lib/mosaic.py:792-829):
  keep scenes whose projection equals the mosaic SRS, whose band count
  matches (with the pan-to-multi and include-all-ms escape hatches), and
  whose datatype matches.
* F6 — product-code gates (/root/reference/lib/ortho_functions.py:863-872):
  reject mosaic products (prod_code[3] == 'M'), 3* products, and 2A tiled
  tifs.
* F9 — status gates (/root/reference/pgc_mosaic_query_index.py:206-220,
  327-330): tile status == '1'; scene status != 'tape'.
* C12 — timestamp parsing for the reference's four formats
  (/root/reference/lib/mosaic.py:66-85, 220-223, 490-497).
* C16 — proj4 datum rewrite (/root/reference/lib/utils.py:85-92).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def matching_images_filter(
    proj: Column, bands: Column, datatype: Column,
    target_proj: str, target_bands: int, target_datatype: int,
    force_pan_to_multi: bool = False, include_all_ms: bool = False,
) -> Column:
    """F1 boolean predicate. Band test passes when counts equal, when a
    1-band image is forced into a multiband mosaic (force_pan_to_multi), or
    when any multispectral count is accepted (include_all_ms)."""
    band_ok = (
        (bands == target_bands)
        | (F.lit(force_pan_to_multi) & (target_bands > 1) & (bands == 1))
        | (F.lit(include_all_ms) & (bands > 1))
    )
    return (proj == target_proj) & band_ok & (datatype == target_datatype)


def prod_code_gate(prod_code: Column, tile: Column | None = None,
                   ext: Column | None = None) -> Column:
    """F6: False for products the ortho pipeline rejects. Python indices
    [3], [1] and [1:3] are 1-based substrings (4,1), (2,1) and (2,2)."""
    is_mosaic = F.substring(prod_code, 4, 1) == "M"
    is_l3 = F.substring(prod_code, 2, 1) == "3"
    is_2a_tiled = F.substring(prod_code, 2, 2) == "2A"
    if tile is not None:
        is_2a_tiled = is_2a_tiled & tile.isNotNull()
    if ext is not None:
        is_2a_tiled = is_2a_tiled & (ext == ".tif")
    return ~(is_mosaic | is_l3 | is_2a_tiled)


def tile_status_ok(status: Column) -> Column:
    return status == "1"


def scene_not_on_tape(status: Column) -> Column:
    return F.coalesce(status != "tape", F.lit(True))


# C12 — the reference's four observed timestamp shapes
TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",  # ISO with fraction + Z
    "yyyy-MM-dd'T'HH:mm:ss",             # plain ISO
    "yyyy-MM-dd HH:mm 'GMT'",            # IKONOS metadata
    "yyyyMMddHHmmss",                    # filename stamp
]


def parse_acq_time(ts: Column) -> Column:
    """First-success parse across the reference's formats (try_to_timestamp
    per format, coalesced in trial order)."""
    attempts = [F.try_to_timestamp(ts, F.lit(fmt)) for fmt in TS_FORMATS]
    return F.coalesce(*attempts)


def proj4_datum_rewrite(proj4: Column) -> Column:
    """C16 — normalize explicit GRS80+towgs84 spellings to named datums
    (/root/reference/lib/utils.py:85-92)."""
    out = F.regexp_replace(
        proj4,
        r"\+ellps=GRS80 \+towgs84=0,0,0,0,0,0,0",
        "+datum=NAD83",
    )
    out = F.regexp_replace(
        out,
        r"\+ellps=WGS84 \+towgs84=0,0,0,0,0,0,0",
        "+datum=WGS84",
    )
    return out
