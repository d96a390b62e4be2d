"""Geohash and Web-Mercator (slippy/XYZ + Bing quadkey) layout keys — the
two remaining PUBLIC spatial-key families next to Morton (zorder.py) and
Hilbert (hilbert.py).  A web-page tiling pipeline uses them at the edges:
geohash for interoperable prefix-joinable ids (ElasticSearch/Redis
convention), XYZ/quadkey for map-tile addressing (OSM slippy scheme /
Bing Maps Tile System, both published specs).

Both are ONE closed-form JVM column expression (shift/and/or + substr
algebra — whole-stage codegen, no UDF) with an ANSI-SQL twin rendered
from the same generator so the DuckDB oracle runs the IDENTICAL text.

Geohash (Niemeyer's public scheme): ``precision`` chars = 5p bits,
alternating lon,lat starting with lon (lon gets ceil(5p/2) bits).  The
subdivision bits are exactly the bits of the quantized integers
``x = floor((lon+180)/360 * 2^kx)`` / ``y = floor((lat+90)/180 * 2^ky)``
(MSB-first), so no loop is needed: interleave + base32.  Alphabet
"0123456789bcdefghjkmnpqrstuvwxyz" (no a,i,l,o).

Slippy/XYZ (OSM wiki "Slippy map tilenames"):
``xtile = floor((lon+180)/360 * 2^z)``,
``ytile = floor((1 - ln(tan(lat') + 1/cos(lat'))/pi)/2 * 2^z)`` with
lat' = radians(lat clamped to ±85.05112878).  The trig/ln chain is the
same expression TEXT on both engines (same-libm convention as warp_utm).
Quadkey (Bing spec): digit i = y-bit<<1 | x-bit, MSB first, base 4.

Scale shape: all keys are embarrassingly parallel scans; range-
partitioning on the geohash string (prefix order) or quadkey gives the
same file-skipping contiguity argument as zorder_repartition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_MERC_LAT = 85.05112878  # Bing Maps Tile System published clamp


# ---------------------------------------------------------------- geohash

def _geohash_bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    kx = (total + 1) // 2  # lon leads, gets the extra bit when odd
    ky = total // 2
    return kx, ky


def geohash_col(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Geohash string of ``precision`` chars as one JVM expression."""
    kx, ky = _geohash_bits(precision)
    x = F.least(F.lit((1 << kx) - 1), F.greatest(F.lit(0), F.floor(
        (lon + 180.0) / 360.0 * float(1 << kx)))).cast("long")
    y = F.least(F.lit((1 << ky) - 1), F.greatest(F.lit(0), F.floor(
        (lat + 90.0) / 180.0 * float(1 << ky)))).cast("long")
    # interleaved integer, lon bit t (MSB-first) at interleaved pos 2t,
    # lat bit t at 2t+1; as an LSB-shift sum (fits 40 bits for p=8)
    total = 5 * precision
    g = F.lit(0).cast("long")
    for t in range(kx):  # lon bit t -> shift total-1-2t
        g = g + F.shiftleft(F.shiftright(x, kx - 1 - t).bitwiseAND(F.lit(1)),
                            total - 1 - 2 * t)
    for t in range(ky):  # lat bit t -> shift total-2-2t
        g = g + F.shiftleft(F.shiftright(y, ky - 1 - t).bitwiseAND(F.lit(1)),
                            total - 2 - 2 * t)
    # dynamic-index char pick: element_at over the split alphabet (JVM-side)
    arr = F.split(F.lit("|".join(GEOHASH_BASE32)), "[|]")
    pieces = []
    for k in range(precision):
        shift = total - 5 * (k + 1)
        idx = (F.shiftright(g, shift).bitwiseAND(F.lit(31)) + 1).cast("int")
        pieces.append(F.element_at(arr, idx))
    return F.concat(*pieces)


def geohash_parts_sql(lon: str, lat: str, precision: int = 8):
    """ANSI-SQL twin, exposed as pipeline parts for CTE chaining:
    returns (x_expr, y_expr, g_expr over cols xg/yg, char_concat over
    col gg)."""
    kx, ky = _geohash_bits(precision)
    total = 5 * precision
    x = (f"cast(least({(1 << kx) - 1}, greatest(0, "
         f"floor(({lon} + 180.0) / 360.0 * {float(1 << kx)}))) as bigint)")
    y = (f"cast(least({(1 << ky) - 1}, greatest(0, "
         f"floor(({lat} + 90.0) / 180.0 * {float(1 << ky)}))) as bigint)")
    terms = []
    for t in range(kx):
        terms.append(f"((((xg >> {kx - 1 - t}) & 1)) << {total - 1 - 2 * t})")
    for t in range(ky):
        terms.append(f"((((yg >> {ky - 1 - t}) & 1)) << {total - 2 - 2 * t})")
    g = "cast(" + " + ".join(terms) + " as bigint)"
    chars = []
    for k in range(precision):
        shift = total - 5 * (k + 1)
        chars.append(
            f"substr('{GEOHASH_BASE32}', "
            f"cast(((gg >> {shift}) & 31) + 1 as int), 1)")
    return x, y, g, " || ".join(chars)


def geohash_sql(lon: str, lat: str, precision: int = 8) -> str:
    """The identical geohash in ANSI SQL as one scalar subquery."""
    x, y, g, concat = geohash_parts_sql(lon, lat, precision)
    return (f"(SELECT {concat} FROM (SELECT {g} AS gg "
            f"FROM (SELECT {x} AS xg, {y} AS yg) q1) q2)")


# ------------------------------------------------------- slippy + quadkey

def _merc_lat(lat: Column) -> Column:
    return F.least(F.lit(MAX_MERC_LAT), F.greatest(F.lit(-MAX_MERC_LAT), lat))


def slippy_cols(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    """OSM XYZ tile indices at zoom ``z`` (identical expr text as
    slippy_sql; ln/tan/cos via the shared libm convention)."""
    n = 1 << z
    xt = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(
        (lon + 180.0) / 360.0 * float(n)))).cast("long")
    latr = F.radians(_merc_lat(lat))
    yt = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(
        (1.0 - F.log(F.tan(latr) + 1.0 / F.cos(latr)) / 3.141592653589793)
        / 2.0 * float(n)))).cast("long")
    return xt, yt


def slippy_sql(lon: str, lat: str, z: int) -> tuple[str, str]:
    n = 1 << z
    xt = (f"cast(least({n - 1}, greatest(0, "
          f"floor(({lon} + 180.0) / 360.0 * {float(n)}))) as bigint)")
    latc = (f"radians(least({MAX_MERC_LAT}, "
            f"greatest(-{MAX_MERC_LAT}, {lat})))")
    yt = (f"cast(least({n - 1}, greatest(0, floor((1.0 - "
          f"ln(tan({latc}) + 1.0 / cos({latc})) / 3.141592653589793) "
          f"/ 2.0 * {float(n)}))) as bigint)")
    return xt, yt


def quadkey_col(xt: Column, yt: Column, z: int) -> Column:
    """Bing quadkey string: digit i = y-bit<<1 | x-bit, MSB first."""
    arr = F.split(F.lit("0|1|2|3"), "[|]")
    pieces = []
    for i in range(z):
        shift = z - 1 - i
        d = (F.shiftleft(F.shiftright(yt, shift).bitwiseAND(F.lit(1)), 1)
             + F.shiftright(xt, shift).bitwiseAND(F.lit(1)) + 1).cast("int")
        pieces.append(F.element_at(arr, d))
    return F.concat(*pieces)


def quadkey_sql(xt: str, yt: str, z: int) -> str:
    chars = []
    for i in range(z):
        shift = z - 1 - i
        d = (f"cast(((({yt}) >> {shift}) & 1) * 2 + "
             f"((({xt}) >> {shift}) & 1) + 1 as int)")
        chars.append(f"substr('0123', {d}, 1)")
    return " || ".join(chars)
