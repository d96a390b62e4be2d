"""Coordinate transforms (R3 warp analog) — pure NumPy, vectorized.

The reference shells out to ``gdalwarp -t_srs`` (/root/reference/lib/
ortho_functions.py:1804-1932); the engine's point-shaped data only needs the
coordinate transform itself. Implemented from the public ellipsoidal
polar-stereographic and transverse-Mercator equations (Snyder, *Map
Projections — A Working Manual*, USGS PP 1395, 1987) for every CRS the
reference's EPSG picker auto-selects (/root/reference/lib/ortho_functions.py:
1162-1236):

* EPSG:3413 — NSIDC Sea Ice Polar Stereographic North (lat_ts 70N, lon_0 -45)
* EPSG:3031 — Antarctic Polar Stereographic (lat_ts 71S, lon_0 0)
* EPSG:326xx/327xx — WGS84 UTM north/south, zones 1..60 (|lat| <= 60 picks)
* EPSG:269xx — NAD83 UTM north, zones 1..23 (GRS80 ellipsoid)

WGS84 ellipsoid: a=6378137, f=1/298.257223563. Forward + inverse;
round-trip accuracy < 1 mm (tested; quarter-meridian golden 10001965.7293 m).
"""

from __future__ import annotations

import numpy as np

A = 6378137.0
F_INV = 298.257223563
E2 = 2.0 / F_INV - 1.0 / F_INV ** 2
E = float(np.sqrt(E2))

PARAMS = {
    3413: dict(lat_ts=70.0, lon_0=-45.0, north=True),
    3031: dict(lat_ts=-71.0, lon_0=0.0, north=False),
}


def _t(lat_rad: np.ndarray) -> np.ndarray:
    """Snyder eq. 15-9 (isometric colatitude function)."""
    s = np.sin(lat_rad)
    return np.tan(np.pi / 4 - lat_rad / 2) / ((1 - E * s) / (1 + E * s)) ** (E / 2)


def _m(lat_rad: np.ndarray) -> np.ndarray:
    """Snyder eq. 14-15."""
    s = np.sin(lat_rad)
    return np.cos(lat_rad) / np.sqrt(1 - E2 * s * s)


def _tc_mc(p):
    lat_ts = np.abs(np.radians(np.asarray(p["lat_ts"])))
    return _t(lat_ts), _m(lat_ts)


def polar_stereo_forward(lon, lat, epsg: int):
    """(lon, lat) degrees -> (x, y) meters in the given polar stereographic
    CRS. North aspect (Snyder 21-33/34): x = rho sin(dl), y = -rho cos(dl);
    south aspect (21-35/36, working in -lat): y = +rho cos(dl)."""
    p = PARAMS[epsg]
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dl = np.radians(lon - p["lon_0"])
    tc, mc = _tc_mc(p)
    t = _t(np.radians(lat if p["north"] else -lat))
    rho = A * mc * t / tc
    x = rho * np.sin(dl)
    y = (-rho if p["north"] else rho) * np.cos(dl)
    return x, y


# --------------------------------------------------------------------- UTM
# Transverse Mercator series (Snyder, USGS PP 1395, eqs. 8-9..8-17 forward,
# 8-18..8-25 + 3-22 inverse; accuracy ~0.1 mm inside a 6-degree zone).
# Covers every EPSG the C5 picker (functions/scalar.py, reference
# lib/ortho_functions.py:1162-1236) can select for |lat| <= 60:
# 326xx (WGS84 north), 327xx (WGS84 south), 269xx (NAD83/GRS80 north).

K0_UTM = 0.9996
FE_UTM = 500000.0
FN_SOUTH = 10000000.0

GRS80_F_INV = 298.257222101


def _ellipsoid_consts(f_inv: float) -> dict:
    e2 = 2.0 / f_inv - 1.0 / f_inv ** 2
    sq = float(np.sqrt(1.0 - e2))
    return dict(
        e2=e2,
        ep2=e2 / (1.0 - e2),
        c0=1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256,
        c2=3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024,
        c4=15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024,
        c6=35 * e2 ** 3 / 3072,
        e1=(1 - sq) / (1 + sq),
    )


WGS84 = _ellipsoid_consts(F_INV)
GRS80 = _ellipsoid_consts(GRS80_F_INV)


def utm_zone_from_lon(lon) -> np.ndarray:
    """Zone 1..60 — same branch as the EPSG picker (scalar.get_epsg_from_lat_lon)."""
    return np.maximum(1, np.ceil((np.asarray(lon, dtype=np.float64) + 180.0) / 6.0)).astype(np.int64)


def epsg_to_utm(epsg: int) -> tuple[int, bool, dict]:
    """EPSG -> (zone, south, ellipsoid consts). Raises on non-UTM codes."""
    if 32601 <= epsg <= 32660:
        return epsg - 32600, False, WGS84
    if 32701 <= epsg <= 32760:
        return epsg - 32700, True, WGS84
    if 26901 <= epsg <= 26923:
        return epsg - 26900, False, GRS80
    raise ValueError(f"not a supported UTM EPSG: {epsg}")


def _meridian_arc(phi: np.ndarray, k: dict) -> np.ndarray:
    """Snyder eq. 3-21: meridian distance from the equator."""
    return A * (k["c0"] * phi - k["c2"] * np.sin(2 * phi)
                + k["c4"] * np.sin(4 * phi) - k["c6"] * np.sin(6 * phi))


def utm_forward(lon, lat, zone=None, south=None, ellps: dict = WGS84):
    """(lon, lat) degrees -> (easting, northing) meters. ``zone`` defaults to
    the longitude's own zone, ``south`` to lat < 0 (the auto-EPSG path)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    z = utm_zone_from_lon(lon) if zone is None else np.asarray(zone)
    s = (lat < 0) if south is None else np.asarray(south)
    k = ellps
    lon0 = -183.0 + 6.0 * z
    phi = np.radians(lat)
    dlam = np.radians(lon - lon0)
    sinp, cosp, tanp = np.sin(phi), np.cos(phi), np.tan(phi)
    n = A / np.sqrt(1 - k["e2"] * sinp * sinp)
    t = tanp * tanp
    c = k["ep2"] * cosp * cosp
    a_ = dlam * cosp
    m = _meridian_arc(phi, k)
    x = K0_UTM * n * (a_ + (1 - t + c) * a_ ** 3 / 6
                      + (5 - 18 * t + t * t + 72 * c - 58 * k["ep2"]) * a_ ** 5 / 120) + FE_UTM
    y = K0_UTM * (m + n * tanp * (a_ * a_ / 2
                                  + (5 - t + 9 * c + 4 * c * c) * a_ ** 4 / 24
                                  + (61 - 58 * t + t * t + 600 * c - 330 * k["ep2"]) * a_ ** 6 / 720))
    y = y + np.where(s, FN_SOUTH, 0.0)
    return x, y


def utm_inverse(x, y, zone, south, ellps: dict = WGS84):
    """(easting, northing) meters -> (lon, lat) degrees (footpoint series)."""
    x = np.asarray(x, dtype=np.float64) - FE_UTM
    y = np.asarray(y, dtype=np.float64) - (FN_SOUTH if south else 0.0)
    k = ellps
    e1 = k["e1"]
    mu = y / K0_UTM / (A * k["c0"])
    phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
    sinp, cosp, tanp = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = k["ep2"] * cosp * cosp
    t1 = tanp * tanp
    n1 = A / np.sqrt(1 - k["e2"] * sinp * sinp)
    r1 = A * (1 - k["e2"]) / (1 - k["e2"] * sinp * sinp) ** 1.5
    d = x / (n1 * K0_UTM)
    phi = phi1 - (n1 * tanp / r1) * (
        d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * k["ep2"]) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * k["ep2"] - 3 * c1 * c1) * d ** 6 / 720)
    lam = (d - (1 + 2 * t1 + c1) * d ** 3 / 6
           + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * k["ep2"] + 24 * t1 * t1) * d ** 5 / 120) / cosp
    lon0 = -183.0 + 6.0 * zone
    return np.degrees(lam) + lon0, np.degrees(phi)


def utm_forward_sql(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """The WGS84 auto-zone forward transform as TWO ANSI-SQL expressions
    (easting, northing) valid in BOTH Spark SQL and DuckDB — the battery
    query evaluates this exact text via ``F.expr`` so both engines run the
    same formula with the same full-precision literals. Outputs are rounded
    to 1 mm (trig libm ULPs differ between JVM and DuckDB; 1e-3 m is ~7
    orders above the ULP noise)."""
    k = WGS84
    zone = f"greatest(1, ceil(({lon} + 180) / 6))"
    lon0 = f"(-183.0 + 6.0 * {zone})"
    phi = f"radians({lat})"
    dlam = f"radians({lon} - {lon0})"
    sinp, cosp, tanp = f"sin({phi})", f"cos({phi})", f"tan({phi})"
    n = f"(6378137.0 / sqrt(1 - {k['e2']!r} * {sinp} * {sinp}))"
    t = f"({tanp} * {tanp})"
    c = f"({k['ep2']!r} * {cosp} * {cosp})"
    a_ = f"({dlam} * {cosp})"
    m = (f"(6378137.0 * ({k['c0']!r} * {phi} - {k['c2']!r} * sin(2 * {phi}) "
         f"+ {k['c4']!r} * sin(4 * {phi}) - {k['c6']!r} * sin(6 * {phi})))")
    x = (f"round(0.9996 * {n} * ({a_} + (1 - {t} + {c}) * pow({a_}, 3) / 6 "
         f"+ (5 - 18 * {t} + {t} * {t} + 72 * {c} - 58 * {k['ep2']!r}) "
         f"* pow({a_}, 5) / 120) + 500000.0, 3)")
    y = (f"round(0.9996 * ({m} + {n} * {tanp} * ({a_} * {a_} / 2 "
         f"+ (5 - {t} + 9 * {c} + 4 * {c} * {c}) * pow({a_}, 4) / 24 "
         f"+ (61 - 58 * {t} + {t} * {t} + 600 * {c} - 330 * {k['ep2']!r}) "
         f"* pow({a_}, 6) / 720)) "
         f"+ (CASE WHEN {lat} < 0 THEN 10000000.0 ELSE 0.0 END), 3)")
    return x, y


def polar_stereo_inverse(x, y, epsg: int, iters: int = 12):
    """(x, y) meters -> (lon, lat) degrees. Iterative lat (Snyder eq. 7-9)."""
    p = PARAMS[epsg]
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, y)
    tc, mc = _tc_mc(p)
    t = rho * tc / (A * mc)
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(iters):
        s = np.sin(lat)
        lat = np.pi / 2 - 2 * np.arctan(t * ((1 - E * s) / (1 + E * s)) ** (E / 2))
    lon = np.arctan2(x, -y if p["north"] else y)
    lat_deg = np.degrees(lat)
    if not p["north"]:
        lat_deg = -lat_deg
    lon_deg = np.degrees(lon) + p["lon_0"]
    lon_deg = (lon_deg + 180.0) % 360.0 - 180.0
    return lon_deg, lat_deg
