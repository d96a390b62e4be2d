"""Coordinate transforms (R3 warp analog) — pure NumPy, vectorized.

The reference shells out to ``gdalwarp -t_srs`` (/root/reference/lib/
ortho_functions.py:1804-1932); the engine's point-shaped data only needs the
coordinate transform itself. Implemented from the public ellipsoidal
polar-stereographic equations (Snyder, *Map Projections — A Working Manual*,
USGS PP 1395, 1987, eqs. 15-9, 21-33..21-40) for the two CRSs the reference
auto-selects (/root/reference/lib/ortho_functions.py:1228-1233):

* EPSG:3413 — NSIDC Sea Ice Polar Stereographic North (lat_ts 70N, lon_0 -45)
* EPSG:3031 — Antarctic Polar Stereographic (lat_ts 71S, lon_0 0)

WGS84 ellipsoid: a=6378137, f=1/298.257223563. Forward + iterative inverse;
round-trip accuracy << 1 mm (tested).
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
