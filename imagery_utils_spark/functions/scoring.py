"""Quality-score operator — exact reimplementation of ``ImageInfo.getScore``
(/root/reference/lib/mosaic.py:499-646) as a single Spark Column expression
(JVM-side, whole-stage codegen; no UDF in the hot path).

Golden parity (reference tests/test_mosaic_lib.py):
  79.1422222 (GE01), 79.2 (WV01), 78.555555555 (WV02 ndvi), 86.0924408
  (tday 09-01, date_diff 24), 134.2 (tyear 2008), 90.6334244 (tday+tyear),
  -1 (cc 0.29 > max_cc 0.20), 77.2106667 (Vantor WV02).

Weight table (/root/reference/lib/mosaic.py:581-621):
  no targets:  (cc, sunel, ona, datediff, yeardiff) = (48, 28, 24, 0, 0)
  tday only:   (30, 10, 5, 55, 0)
  tyear only:  (48, 28, 24, 0, 55)
  tday+tyear:  (30, 10, 5, 28, 28)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exposure thresholds: /root/reference/lib/mosaic.py:538-551
PAN_EXPOSURE_THRESHOLDS = {"WV01": 1400, "WV02": 1400, "WV03": 1400, "QB02": 500}
MULTI_EXPOSURE_THRESHOLDS = {"WV02": 400, "WV03": 400, "GE01": 170, "QB02": 25}

MISSING_DIFF = -9999  # sentinel carried into the formula exactly as the reference does


@dataclass(frozen=True)
class ScoreParams:
    """Mirror of MosaicParams fields consumed by getScore
    (/root/reference/lib/mosaic.py:851-903)."""

    bands: int = 1
    max_cc: float = 0.5
    use_exposure: bool = False
    force_pan_to_multi: bool = False
    tday: str | None = None          # "mm-dd"
    tyear: object = None             # int (yyyy) or "yyyy-yyyy" range string

    @property
    def m(self) -> int:
        return int(self.tday.split("-")[0]) if self.tday else 0

    @property
    def d(self) -> int:
        return int(self.tday.split("-")[1]) if self.tday else 0

    @property
    def years(self) -> list[int]:
        if self.tyear is None:
            return []
        s = str(self.tyear)
        if len(s) == 4:
            return [int(s)]
        lo, hi = s.split("-")
        return list(range(int(lo), int(hi) + 1))

    @property
    def weights(self) -> tuple[int, int, int, int, int]:
        ccwt, sunelwt, onawt, datediffwt = (30, 10, 5, 55) if self.m != 0 else (48, 28, 24, 0)
        if self.years:
            yeardiffwt = 55 if self.m == 0 else 28
            if self.m != 0:
                datediffwt = 28
        else:
            yeardiffwt = 0
        return ccwt, sunelwt, onawt, datediffwt, yeardiffwt


def date_diff_col(acq_time: Column, m: int, d: int) -> Column:
    """min over y in {year-1, year, year+1} of abs((datetime(y,m,d) - acq_time).days)
    (/root/reference/lib/mosaic.py:573-578). ``timedelta.days`` floors toward
    -inf BEFORE the abs: for acquisitions *after* the target with a fractional
    day offset the reference effectively ceils (acq 2011-09-05 14:00 vs target
    09-01 -> days = floor(-4.58) = -5 -> diff 5, not 4). So: the *signed*
    delta first, floor, then abs."""
    deltas = []
    for dy in (-1, 0, 1):
        target = F.make_timestamp(
            F.year(acq_time) + dy, F.lit(m), F.lit(d), F.lit(0), F.lit(0), F.lit(0)
        )
        days = F.floor((F.unix_timestamp(target) - F.unix_timestamp(acq_time)) / 86400)
        deltas.append(F.abs(days))
    dd = F.least(*deltas)
    return F.when(acq_time.isNull(), F.lit(MISSING_DIFF)).otherwise(dd)


def year_diff_col(acq_time: Column, years: list[int]) -> Column:
    """min |target_year - acq_year| (/root/reference/lib/mosaic.py:600-613)."""
    diffs = [F.abs(F.lit(int(y)) - F.year(acq_time)) for y in years]
    yd = diffs[0] if len(diffs) == 1 else F.least(*diffs)
    return F.when(acq_time.isNull(), F.lit(MISSING_DIFF)).otherwise(yd)


def score_col(
    params: ScoreParams,
    *,
    cloudcover: Column,
    sun_elev: Column,
    off_nadir: Column,
    sensor: Column,
    bands: Column,
    tdi: Column | None = None,
    acq_time: Column | None = None,
) -> Column:
    """The full gate + formula pipeline. Returns -1.0 for gated-out rows,
    else ``panfactor * (ccwt*(1-cc) + sunelwt*sunel/90 + onawt*(90-ona)/90 +
    datediffwt*(183-date_diff)/183 + yeardiffwt/(year_diff+1))``
    (/root/reference/lib/mosaic.py:640-643)."""
    acq_time = acq_time if acq_time is not None else F.lit(None).cast("timestamp")
    tdi = tdi if tdi is not None else F.lit(None).cast("double")

    # required attribs (lib/mosaic.py:506-519): sensor+sunel+ona+cloudcover
    missing_required = (
        sun_elev.isNull() | off_nadir.isNull() | cloudcover.isNull() | sensor.isNull()
    )

    # panfactor (lib/mosaic.py:523-527)
    panfactor = (
        F.when((bands == 1) & F.lit(params.force_pan_to_multi), F.lit(0.5)).otherwise(F.lit(1.0))
    )

    # exposure gate (lib/mosaic.py:530-564); missing tdi -> no gate, like the ref
    thresholds = PAN_EXPOSURE_THRESHOLDS if params.bands == 1 else MULTI_EXPOSURE_THRESHOLDS
    threshold_col = F.coalesce(
        *[F.when(sensor == s, F.lit(float(t))) for s, t in thresholds.items()],
        F.lit(None).cast("double"),
    )
    overexposed = (
        F.lit(params.use_exposure)
        & tdi.isNotNull()
        & threshold_col.isNotNull()
        & ((tdi * sun_elev) > threshold_col)
    )

    # cloud cover normalize + gates (lib/mosaic.py:627-637)
    cc = F.when((cloudcover < 0) | (cloudcover > 1), F.lit(params.max_cc)).otherwise(cloudcover)
    too_cloudy = cc > params.max_cc
    sun_too_low = sun_elev < 2

    ccwt, sunelwt, onawt, datediffwt, yeardiffwt = params.weights
    dd = date_diff_col(acq_time, params.m, params.d) if params.m != 0 else F.lit(MISSING_DIFF)
    yd = year_diff_col(acq_time, params.years) if params.years else F.lit(MISSING_DIFF)

    rawscore = (
        F.lit(float(ccwt)) * (F.lit(1.0) - cc)
        + F.lit(float(sunelwt)) * (sun_elev / 90)
        + F.lit(float(onawt)) * ((F.lit(90.0) - off_nadir) / 90.0)
        + F.lit(float(datediffwt)) * ((F.lit(183.0) - dd) / 183.0)
        + F.lit(float(yeardiffwt)) * (F.lit(1.0) / (yd + 1))
    )

    return (
        F.when(missing_required, F.lit(-1.0))
        .when(overexposed | too_cloudy | sun_too_low, F.lit(-1.0))
        .otherwise(rawscore * panfactor)
    )


def score_sql(params: ScoreParams, cc="cloudcover", sunel="sun_elev", ona="off_nadir",
              acq="acq_time") -> str:
    """ANSI-SQL rendering of the same formula (DuckDB-oracle parity).

    Only the formula branch (no exposure/missing gates) — callers compose
    gates with WHERE clauses. date/year targets rendered inline.
    """
    ccwt, sunelwt, onawt, datediffwt, yeardiffwt = params.weights
    cc_n = f"(CASE WHEN {cc} < 0 OR {cc} > 1 THEN {params.max_cc} ELSE {cc} END)"
    if params.m != 0:
        # abs AFTER the floor of the signed day delta (timedelta.days parity)
        targets = ",".join(
            f"abs(floor(epoch(make_timestamp(year({acq}){dy:+d}, {params.m}, {params.d}, 0, 0, 0) - {acq}) / 86400))"
            for dy in (-1, 0, 1)
        )
        dd = f"least({targets})"
    else:
        dd = str(MISSING_DIFF)
    if params.years:
        yd = "least(" + ",".join(f"abs({y} - year({acq}))" for y in params.years) + ")"
    else:
        yd = str(MISSING_DIFF)
    return (
        f"({ccwt}.0 * (1.0 - {cc_n}) + {sunelwt}.0 * ({sunel} / 90) "
        f"+ {onawt}.0 * ((90.0 - {ona}) / 90.0) "
        f"+ {datediffwt}.0 * ((183.0 - {dd}) / 183.0) "
        f"+ {yeardiffwt}.0 * (1.0 / ({yd} + 1)))"
    )
