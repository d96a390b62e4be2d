"""Scalar helpers with golden-value parity to the reference, in two forms:

* plain Python/NumPy (used inside pandas UDFs and unit tests), and
* Spark ``Column`` expressions (JVM-side, whole-stage-codegen friendly) —
  these are the hot-path forms; the Python forms exist to pin goldens.

Reference parity targets (tests/test_mosaic_lib.py, tests/test_ortho_functions.py):
  buffernum(10,5)=='00010'; drange(5,0,1)==[]; pl2xy goldens (500,1525)/(450,1525);
  calc_earth_sun_dist(2010-10-20 10:20:10)==0.9957508611980816;
  EPSG branch table (utm N/S, NAD83 zones 1-23, polar 3413/3031).
"""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

# ----------------------------------------------------------------- buffernum
# /root/reference/lib/mosaic.py:1021-1025


def buffernum(num: int, buf: int) -> str:
    """Zero-pad ``num`` to width ``buf`` (tile naming)."""
    s = str(num)
    while len(s) < buf:
        s = "0" + s
    return s


def buffernum_col(num: Column, buf: Column | int) -> Column:
    """lpad only grows the string — same semantics as the reference loop for
    non-negative ints (the reference gives '0-5' for negatives; unsupported)."""
    s = num.cast("string")
    return F.lpad(s, F.greatest(F.length(s), F.lit(buf) if isinstance(buf, int) else buf), "0")


# ----------------------------------------------------------------- drange
# /root/reference/lib/mosaic.py:1014-1018


def drange(start: float, stop: float, step: float):
    """Float range generator, empty when start >= stop."""
    r = start
    while r < stop:
        yield r
        r += step


def drange_col(start: Column, stop: Column, step: Column) -> Column:
    """Array column with float parity to the reference's accumulate-and-compare
    loop (r += step while r < stop): ``start + i*step`` index arithmetic is NOT
    equivalent for lossy steps (drange(0,1,0.1) accumulates to 11 values ending
    0.9999999999999999; index form gives 10), so this folds an accumulator via
    ``aggregate`` — each element is the previous plus ``step``, and elements
    past the accumulated stop are trimmed. Not a hot-path op (tile-grid edges),
    so the interpreted HOF is fine."""
    # upper bound on length: ceil((stop-start)/step) + 2 covers accumulation
    # undershoot (acc < exact) admitting at most one extra element
    n = F.greatest(F.lit(0), F.ceil((stop - start) / step) + 2)
    acc0 = F.struct(
        F.array().cast("array<double>").alias("arr"),
        start.cast("double").alias("r"),
    )
    folded = F.aggregate(
        F.sequence(F.lit(1), n, F.lit(1)),
        acc0,
        lambda acc, _: F.when(
            acc["r"] < stop,
            F.struct(
                F.concat(acc["arr"], F.array(acc["r"])).alias("arr"),
                (acc["r"] + step).alias("r"),
            ),
        ).otherwise(acc),
        lambda acc: acc["arr"],
    )
    return F.when(n <= 0, F.array().cast("array<double>")).otherwise(folded)


# ----------------------------------------------------------------- pl2xy
# /root/reference/lib/mosaic.py:999-1011


def pl2xy(gtf, p: float, line: float):
    """Pixel/line -> map x,y given a GDAL-style geotransform 6-tuple."""
    cell_x = gtf[1]
    cell_y = -1 * gtf[5]
    x = cell_x * p + gtf[0]
    y = gtf[3] - cell_y * line - cell_y * 0.5
    return x, y


def pl2xy_cols(gtf0, gtf1, gtf3, gtf5, p: Column, line: Column):
    cell_y = F.lit(-1.0) * gtf5 if isinstance(gtf5, Column) else F.lit(-1.0 * gtf5)
    x = F.lit(gtf1) * p + F.lit(gtf0) if not isinstance(gtf1, Column) else gtf1 * p + gtf0
    y = (F.lit(gtf3) if not isinstance(gtf3, Column) else gtf3) - cell_y * line - cell_y * F.lit(0.5)
    return x, y


# ----------------------------------------------------------------- earth-sun
# /root/reference/lib/ortho_functions.py:2172-2192


def calc_earth_sun_dist(t: datetime) -> float:
    """Julian-day based Earth-Sun distance in AU."""
    year, month = t.year, t.month
    ut = t.hour + t.minute / 60.0 + t.second / 3600.0
    if month <= 2:
        year -= 1
        month += 12
    a = int(year / 100)
    b = 2 - a + int(a / 4)
    jd = int(365.25 * (year + 4716)) + int(30.6001 * (month + 1)) + t.day + ut / 24 + b - 1524.5
    g = 357.529 + 0.98560028 * (jd - 2451545.0)
    return 1.00014 - 0.01671 * math.cos(math.radians(g)) - 0.00014 * math.cos(math.radians(2 * g))


def calc_earth_sun_dist_col(ts: Column) -> Column:
    """Same arithmetic as a pure column expression (ANSI-SQL translatable).

    ``int(x)`` truncates toward zero; all operands here are positive so
    ``floor`` is equivalent (years 1..9999, month normalized >= 3).
    """
    y0 = F.year(ts)
    m0 = F.month(ts)
    ut = F.hour(ts) + F.minute(ts) / F.lit(60.0) + F.second(ts) / F.lit(3600.0)
    yy = F.when(m0 <= 2, y0 - 1).otherwise(y0).cast("double")
    mm = F.when(m0 <= 2, m0 + 12).otherwise(m0).cast("double")
    a = F.floor(yy / 100)
    b = F.lit(2) - a + F.floor(a / 4)
    jd = (
        F.floor(F.lit(365.25) * (yy + 4716))
        + F.floor(F.lit(30.6001) * (mm + 1))
        + F.dayofmonth(ts)
        + ut / 24
        + b
        - F.lit(1524.5)
    )
    g = F.lit(357.529) + F.lit(0.98560028) * (jd - F.lit(2451545.0))
    return (
        F.lit(1.00014)
        - F.lit(0.01671) * F.cos(F.radians(g))
        - F.lit(0.00014) * F.cos(F.radians(F.lit(2.0) * g))
    )


# ----------------------------------------------------------------- EPSG pick
# /root/reference/lib/ortho_functions.py:1162-1236


def get_epsg_from_lat_lon(lat: float, lon: float, mode: str = "auto",
                          utm_nad83: bool = False) -> int:
    if not -90 <= lat <= 90:
        raise ValueError(f"lat out of range: {lat}")
    if not -180 <= lon <= 180:
        raise ValueError(f"lon out of range: {lon}")
    if mode not in ("utm", "auto"):
        raise ValueError(f"bad mode: {mode}")
    if mode == "utm" or (-60 <= lat <= 60):
        zone = max(1, math.ceil((lon + 180) / 6))
        if lat >= 0:
            if utm_nad83:
                code = 26900 + zone
                if not 26901 <= code <= 26923:
                    raise ValueError("NAD83 UTM only zones 1-23 northern hemisphere")
                return code
            return 32600 + zone
        if utm_nad83:
            raise ValueError("NAD83 not applicable in southern hemisphere")
        return 32700 + zone
    return 3413 if lat > 60 else 3031


def epsg_col(lat: Column, lon: Column, mode: str = "auto") -> Column:
    """CASE-chain column form (nulls propagate instead of raising)."""
    zone = F.greatest(F.lit(1), F.ceil((lon + 180) / 6)).cast("int")
    utm = F.when(lat >= 0, F.lit(32600) + zone).otherwise(F.lit(32700) + zone)
    if mode == "utm":
        return utm
    return (
        F.when((lat >= -60) & (lat <= 60), utm)
        .when(lat > 60, F.lit(3413))
        .otherwise(F.lit(3031))
    )
