"""Radiometric calibration (C6/C7) + LUT stretches (C8).

Reimplements the DG calibration math of ``get_dg_calib_dict``
(/root/reference/lib/ortho_functions.py:2195-2299):

    rad_fact    = units * gain * abscal / effbandw
    refl_fact   = units * gain * abscal * des^2 * pi / (Esun * cos(90-sunel) * effbandw)
    refl_offset = units * bias * des^2 * pi / (Esun * cos(90-sunel))
    units       = 10 iff GE01 and (abscal_B < 0.004 or abscal_P < 0.01)
                  (/root/reference/lib/ortho_functions.py:2255-2267)
    stretch 'rd' -> (rad_fact, bias); else -> (refl_fact, refl_offset)

Constant tables (Esun/gain/bias) carry the reference values for the sensors
exercised by its test suite (/root/reference/lib/ortho_functions.py:62-306).
The piecewise LUT construction mirrors calc_stats
(/root/reference/lib/ortho_functions.py:1300-1343) including the 'mr'
6-point nonlinear curve mapped back through the inverse reflectance
transform. Everything is vectorizable NumPy (used inside pandas UDFs);
negative sun elevation raises unless stretch == 'ns'
(:2221-2223, golden behavior of tests/test_ortho_functions.py:381-397).
"""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np

from .scalar import calc_earth_sun_dist

# /root/reference/lib/ortho_functions.py:62-142 (subset used by the tests)
ESUN = {
    "QB02_BAND_P": 1370.92, "QB02_BAND_B": 1949.59, "QB02_BAND_G": 1823.64,
    "QB02_BAND_R": 1553.78, "QB02_BAND_N": 1102.85,
    "WV01_BAND_P": 1478.62,
    "WV02_BAND_P": 1571.36, "WV02_BAND_C": 1773.81, "WV02_BAND_B": 2007.27,
    "WV02_BAND_G": 1829.62, "WV02_BAND_Y": 1701.85, "WV02_BAND_R": 1538.85,
    "WV02_BAND_RE": 1346.09, "WV02_BAND_N": 1053.21, "WV02_BAND_N2": 856.599,
    "WV03_BAND_P": 1574.41, "WV03_BAND_C": 1757.89, "WV03_BAND_B": 2004.61,
    "WV03_BAND_G": 1830.18, "WV03_BAND_Y": 1712.07, "WV03_BAND_R": 1535.33,
    "WV03_BAND_RE": 1348.08, "WV03_BAND_N": 1055.94, "WV03_BAND_N2": 858.77,
    "GE01_BAND_P": 1610.73, "GE01_BAND_B": 1993.18, "GE01_BAND_G": 1828.83,
    "GE01_BAND_R": 1491.49, "GE01_BAND_N": 1022.58,
    "IK01_BAND_P": 1353.25, "IK01_BAND_B": 1921.26, "IK01_BAND_G": 1803.28,
    "IK01_BAND_R": 1517.76, "IK01_BAND_N": 1145.8,
}

# /root/reference/lib/ortho_functions.py:144-224 (subset)
GAIN = {
    "QB02_BAND_P": 0.870, "QB02_BAND_B": 1.105, "QB02_BAND_G": 1.071,
    "QB02_BAND_R": 1.060, "QB02_BAND_N": 1.020,
    "WV01_BAND_P": 1.016,
    "WV02_BAND_P": 0.949, "WV02_BAND_C": 1.203, "WV02_BAND_B": 1.002,
    "WV02_BAND_G": 0.953, "WV02_BAND_Y": 0.946, "WV02_BAND_R": 0.955,
    "WV02_BAND_RE": 0.980, "WV02_BAND_N": 0.966, "WV02_BAND_N2": 1.010,
    "WV03_BAND_P": 0.955, "WV03_BAND_C": 0.938, "WV03_BAND_B": 0.946,
    "WV03_BAND_G": 0.958, "WV03_BAND_Y": 0.979, "WV03_BAND_R": 0.969,
    "WV03_BAND_RE": 1.027, "WV03_BAND_N": 0.977, "WV03_BAND_N2": 1.007,
    "GE01_BAND_P": 0.970, "GE01_BAND_B": 1.053, "GE01_BAND_G": 0.994,
    "GE01_BAND_R": 0.998, "GE01_BAND_N": 0.994,
    "IK01_BAND_P": 0.907, "IK01_BAND_B": 1.073, "IK01_BAND_G": 0.990,
    "IK01_BAND_R": 0.940, "IK01_BAND_N": 1.043,
}

# /root/reference/lib/ortho_functions.py:226-306 (subset)
BIAS = {
    "QB02_BAND_P": -1.491, "QB02_BAND_B": -2.820, "QB02_BAND_G": -3.338,
    "QB02_BAND_R": -2.954, "QB02_BAND_N": -4.722,
    "WV01_BAND_P": -1.824,
    "WV02_BAND_P": -5.523, "WV02_BAND_C": -11.839, "WV02_BAND_B": -9.835,
    "WV02_BAND_G": -7.218, "WV02_BAND_Y": -5.675, "WV02_BAND_R": -5.046,
    "WV02_BAND_RE": -6.114, "WV02_BAND_N": -5.096, "WV02_BAND_N2": -4.059,
    "WV03_BAND_P": -5.505, "WV03_BAND_C": -13.099, "WV03_BAND_B": -9.409,
    "WV03_BAND_G": -7.771, "WV03_BAND_Y": -5.489, "WV03_BAND_R": -4.579,
    "WV03_BAND_RE": -5.552, "WV03_BAND_N": -6.508, "WV03_BAND_N2": -3.699,
    "GE01_BAND_P": 0.0, "GE01_BAND_B": 0.0, "GE01_BAND_G": 0.0,
    "GE01_BAND_R": 0.0, "GE01_BAND_N": 0.0,
    "IK01_BAND_P": 0.0, "IK01_BAND_B": 0.0, "IK01_BAND_G": 0.0,
    "IK01_BAND_R": 0.0, "IK01_BAND_N": 0.0,
}


class InvalidSunElevation(ValueError):
    pass


def dg_calib_factors(
    sat: str,
    bands: dict[str, tuple[float, float]],  # band -> (abscal, effbandw)
    acq_time: datetime,
    sun_elev: float,
    stretch: str = "rf",
) -> dict[str, tuple[float, float]]:
    """band -> (factor, offset), exact reference arithmetic."""
    if sun_elev < 0 and stretch != "ns":
        raise InvalidSunElevation(
            "Negative sun elevation angle is only supported if no-stretch is selected"
        )
    sun_angle = 90.0 - sun_elev
    des = calc_earth_sun_dist(acq_time)

    units_factor = 1
    if sat == "GE01":
        if "BAND_B" in bands and bands["BAND_B"][0] < 0.004:
            units_factor = 10
        if "BAND_P" in bands and bands["BAND_P"][0] < 0.01:
            units_factor = 10

    out = {}
    for band, (abscal, effbandw) in bands.items():
        satband = f"{sat}_{band}"
        if satband not in ESUN:
            continue
        esun = ESUN[satband]
        gain = GAIN[satband]
        bias = BIAS[satband]
        rad_fact = units_factor * gain * abscal / effbandw
        refl_fact = units_factor * (gain * abscal * des ** 2 * math.pi) / (
            esun * math.cos(math.radians(sun_angle)) * effbandw
        )
        refl_offset = units_factor * (bias * des ** 2 * math.pi) / (
            esun * math.cos(math.radians(sun_angle))
        )
        out[band] = (rad_fact, bias) if stretch == "rd" else (refl_fact, refl_offset)
    return out


# --------------------------------------------------------------- IK / GE (C7)

# /root/reference/lib/ortho_functions.py:2302-2342 — B,G,R,N,Pan(TDI13)
IK_ESUN = [1930.9, 1854.8, 1556.5, 1156.9, 1375.8]
IK_BANDWIDTH = [71.3, 88.6, 65.8, 95.4, 403]
IK_CALCOEF_PRE = [633, 649, 840, 746, 161]    # pre  2001-02-22
IK_CALCOEF_POST = [728, 727, 949, 843, 161]   # post 2001-02-22
IK_BREAKDATE = datetime(2001, 2, 22)

# /root/reference/lib/ortho_functions.py:2392-2419 — per-band (1-based)
GE_ESUN = [196.0, 185.3, 150.5, 103.9, 161.7]


def ik_calib_factors(acq_time: datetime, sun_elev: float,
                     stretch: str = "rf") -> dict[int, tuple[float, float]]:
    """band index (0..4 = B,G,R,N,Pan) -> (factor, 0). Pre/post-2001-02-22
    coefficient break per the reference. NOTE the reference's guard condition
    is ``sunAngle < 0 and stretch == 'ns'`` (:2315) — inverted relative to
    the DG variant; replicated verbatim."""
    if sun_elev < 0 and stretch == "ns":
        raise InvalidSunElevation(
            "Negative sun elevation angle is only supported if no-stretch is selected"
        )
    theta = 90.0 - sun_elev
    des = calc_earth_sun_dist(acq_time)
    coefs = IK_CALCOEF_PRE if acq_time < IK_BREAKDATE else IK_CALCOEF_POST
    out = {}
    for band in range(5):
        cal, bw, esun = coefs[band], IK_BANDWIDTH[band], IK_ESUN[band]
        rad_fact = 10000.0 / (cal * bw)
        refl_fact = (10000.0 * des ** 2 * math.pi) / (
            cal * bw * esun * math.cos(math.radians(theta))
        )
        out[band] = (rad_fact, 0) if stretch == "rd" else (refl_fact, 0)
    return out


def ge_calib_factors(acq_time: datetime, sun_elev: float, gains: dict[int, float],
                     stretch: str = "rf") -> dict[int, tuple[float, float]]:
    """GE01: per-band gain from metadata; rad = gain*10 (mW/cm2/um ->
    W/m2/um), refl = gain*des^2*pi / (Esun*cos(theta))."""
    if sun_elev < 0 and stretch == "ns":
        raise InvalidSunElevation(
            "Negative sun elevation angle is only supported if no-stretch is selected"
        )
    theta = 90.0 - sun_elev
    des = calc_earth_sun_dist(acq_time)
    out = {}
    for band, gain in gains.items():
        esun = GE_ESUN[band - 1]
        rad_fact = gain * 10
        refl_fact = (gain * des ** 2 * math.pi) / (esun * math.cos(math.radians(theta)))
        out[band] = (rad_fact, 0) if stretch == "rd" else (refl_fact, 0)
    return out


# ---------------------------------------------------------------- LUT (C8)

MR_ILUT = [0, 0.125, 0.25, 0.375, 0.625, 1]
MR_OLUT = [0, 0.375, 0.625, 0.75, 0.875, 1]


def stretch_lut_points(stretch: str, calfact: float, offset: float,
                       imax: float, omax: float) -> list[tuple[float, float]]:
    """The LUT breakpoints of /root/reference/lib/ortho_functions.py:1303-1321."""
    if stretch == "ns":
        return [(0.0, 0.0), (imax, omax)]
    if stretch == "rf":
        return [(0.0, offset * omax), (imax, (imax * calfact + offset) * omax)]
    if stretch == "rd":
        return [(0.0, offset), (imax, imax * calfact + offset)]
    if stretch == "mr":
        return [((i - offset) / calfact, omax * o) for i, o in zip(MR_ILUT, MR_OLUT)]
    raise ValueError(f"unknown stretch: {stretch}")


def apply_lut(values: np.ndarray, points: list[tuple[float, float]]) -> np.ndarray:
    """Piecewise-linear LUT application (GDAL ComplexSource <LUT> semantics:
    linear interpolation between breakpoints, clamped at the ends)."""
    xs = np.asarray([p[0] for p in points], dtype=np.float64)
    ys = np.asarray([p[1] for p in points], dtype=np.float64)
    return np.interp(np.asarray(values, dtype=np.float64), xs, ys)
