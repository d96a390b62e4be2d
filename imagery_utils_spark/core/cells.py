"""Hierarchical discrete global grid (DGG) cell index — pure NumPy, vectorized.

Plays the role of the OGR spatial index in the reference
(`SetSpatialFilter`, /root/reference/pgc_mosaic_query_index.py:261-301): both
sides of a spatial join are tagged with cell ids so the join becomes a plain
equi-join that Catalyst can plan as broadcast / shuffle-hash / sort-merge, and
partition pruning falls out of partitioning tables by cell prefix.

Two id schemes over the same (res, x, y) lattice:

* ``linear`` id = ``y * 2^res + x`` — closed-form floor arithmetic, so the
  same id is computable in ANSI SQL (DuckDB oracle parity) and in Spark
  column expressions without any UDF.
* ``morton`` id = bit-interleaved Z-order — prefix-contiguous, used for
  sort/layout (Z-order clustering of Iceberg/parquet files) and parent-cell
  prefix rollups (analog of `gdaladdo` pyramid levels,
  /root/reference/pgc_mosaic_build_tile.py:216).

Lattice definition (all resolutions): at resolution ``r`` the world
(lon in [-180,180], lat in [-90,90]) is a ``2^r x 2^r`` grid;
``x = floor((lon+180)/360 * 2^r)`` clamped to ``[0, 2^r-1]``, same for lat.
Max res 28 (cell ~1.5e-6 deg) — ids fit int64 with 5 res bits.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28

__all__ = [
    "lonlat_to_xy",
    "xy_to_linear",
    "linear_to_xy",
    "lonlat_to_linear",
    "morton_encode",
    "morton_decode",
    "lonlat_to_morton",
    "morton_parent",
    "linear_parent",
    "cell_bounds_linear",
    "cover_bbox_linear",
    "disk_linear",
    "ring_linear",
]


def _check_res(res: int) -> None:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}], got {res}")


def lonlat_to_xy(lon, lat, res: int):
    """(lon, lat) -> integer lattice coords at ``res``. Vectorized.

    Matches the closed-form SQL: ``least(2^r-1, greatest(0, floor((lon+180)/360*2^r)))``.
    """
    _check_res(res)
    n = np.int64(1) << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return x, y


def xy_to_linear(x, y, res: int):
    """Linear (row-major) cell id = y * 2^res + x — SQL-expressible."""
    _check_res(res)
    return np.asarray(y, dtype=np.int64) * (np.int64(1) << res) + np.asarray(x, dtype=np.int64)


def linear_to_xy(cell, res: int):
    _check_res(res)
    n = np.int64(1) << res
    cell = np.asarray(cell, dtype=np.int64)
    return cell % n, cell // n


def lonlat_to_linear(lon, lat, res: int):
    x, y = lonlat_to_xy(lon, lat, res)
    return xy_to_linear(x, y, res)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 28 bits of v so there is a 0 bit between each."""
    v = v.astype(np.uint64) & np.uint64(0x0FFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(x, y, res: int):
    """Z-order id with res packed in the top bits: (res << 56) | interleave(x, y)."""
    _check_res(res)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    code = _part1by1(x) | (_part1by1(y) << np.uint64(1))
    return (code | (np.uint64(res) << np.uint64(56))).astype(np.int64)


def morton_decode(cell):
    cell = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    res = (cell >> np.uint64(56)).astype(np.int64)
    code = cell & np.uint64((1 << 56) - 1)
    x = _compact1by1(code).astype(np.int64)
    y = _compact1by1(code >> np.uint64(1)).astype(np.int64)
    return x, y, res


def lonlat_to_morton(lon, lat, res: int):
    x, y = lonlat_to_xy(lon, lat, res)
    return morton_encode(x, y, res)


def morton_parent(cell, dres: int = 1):
    """Parent cell ``dres`` levels up — pure bit shift (pyramid rollup, R5)."""
    cell = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    res = (cell >> np.uint64(56)).astype(np.int64)
    new_res = res - dres
    if np.any(new_res < 0):
        raise ValueError("parent resolution below 0")
    code = (cell & np.uint64((1 << 56) - 1)) >> np.uint64(2 * dres)
    return (code | (new_res.astype(np.uint64) << np.uint64(56))).astype(np.int64)


def linear_parent(cell, res: int, dres: int = 1):
    """Parent linear id — SQL-expressible: (y>>d)*2^(r-d) + (x>>d)."""
    x, y = linear_to_xy(cell, res)
    return xy_to_linear(x >> dres, y >> dres, res - dres)


def cell_bounds_linear(cell, res: int):
    """(lon_min, lat_min, lon_max, lat_max) of linear cells. Vectorized."""
    _check_res(res)
    n = float(1 << res)
    x, y = linear_to_xy(cell, res)
    lon0 = x / n * 360.0 - 180.0
    lat0 = y / n * 180.0 - 90.0
    return lon0, lat0, lon0 + 360.0 / n, lat0 + 180.0 / n


def cover_bbox_linear(lon_min, lat_min, lon_max, lat_max, res: int) -> np.ndarray:
    """All linear cell ids whose cell rectangle intersects the bbox (superset
    cover — the exact-refine stage removes false positives, mirroring
    filter-and-refine of SetSpatialFilter + Intersects,
    /root/reference/pgc_mosaic_query_index.py:300-322).

    Scalar bbox -> 1-D array of ids. An anti-meridian-crossing bbox
    (lon_min > lon_max) is split into two covers (getWrappedGeometry analog,
    /root/reference/lib/utils.py:561-645).
    """
    if lon_min > lon_max:  # crosses 180
        west = cover_bbox_linear(lon_min, lat_min, 180.0, lat_max, res)
        east = cover_bbox_linear(-180.0, lat_min, lon_max, lat_max, res)
        return np.unique(np.concatenate([west, east]))
    x0, y0 = lonlat_to_xy(lon_min, lat_min, res)
    x1, y1 = lonlat_to_xy(np.nextafter(lon_max, -np.inf), np.nextafter(lat_max, -np.inf), res)
    x1 = max(int(x1), int(x0))
    y1 = max(int(y1), int(y0))
    xs = np.arange(int(x0), x1 + 1, dtype=np.int64)
    ys = np.arange(int(y0), y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return xy_to_linear(gx.ravel(), gy.ravel(), res)


def disk_linear(cell: int, res: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the kNN expanding-ring search
    space; ring k = disk(k) \\ disk(k-1)). Longitude wraps at the
    anti-meridian; latitude clamps at the poles."""
    _check_res(res)
    n = np.int64(1) << res
    x, y = linear_to_xy(np.asarray([cell]), res)
    xs = (np.arange(-k, k + 1, dtype=np.int64) + x[0]) % n
    ys = np.arange(-k, k + 1, dtype=np.int64) + y[0]
    ys = ys[(ys >= 0) & (ys < n)]
    gx, gy = np.meshgrid(xs, ys)
    return np.unique(xy_to_linear(gx.ravel(), gy.ravel(), res))


def ring_linear(cell: int, res: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance k (expanding-ring step for kNN)."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    outer = disk_linear(cell, res, k)
    inner = disk_linear(cell, res, k - 1)
    return np.setdiff1d(outer, inner, assume_unique=True)
