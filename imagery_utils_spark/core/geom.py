"""Vectorized planar geometry kernels — pure NumPy.

Replaces the OGR geometry predicates the reference leans on
(`Intersects`, envelope tests, /root/reference/lib/mosaic.py:819-829) with
batch-friendly NumPy so they can run inside pandas/Arrow UDFs.

Polygons are represented as *packed ring arrays*: a polygon is
``(coords, ring_offsets)`` where ``coords`` is an (N, 2) float64 array of
vertices of all rings concatenated (rings need not repeat the first point)
and ``ring_offsets`` marks ring starts. A simple WKT parser is included so
fixtures and tests can speak WKT like the reference does
(/root/reference/lib/mosaic.py:287-289).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "parse_wkt_polygon",
    "polygon_wkt",
    "ring_area",
    "polygon_area",
    "envelope",
    "envelopes_intersect",
    "points_in_ring",
    "points_in_polygon",
    "does_cross_180",
    "wrap_geometry_180",
]

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_RING_RE = re.compile(r"\(\s*((?:%s\s+%s\s*,?\s*)+)\)" % (_NUM, _NUM))


def parse_wkt_polygon(wkt: str):
    """POLYGON/MULTIPOLYGON WKT -> (coords (N,2) float64, ring_offsets int64).

    The closing vertex of each ring (== first vertex) is dropped. All rings of
    a multipolygon are concatenated; exterior-ring winding is not enforced
    (matches the reference, which builds rings verbatim from corner lists,
    /root/reference/lib/mosaic.py:287-291).
    """
    s = wkt.strip()
    if not s.upper().startswith(("POLYGON", "MULTIPOLYGON")):
        raise ValueError(f"not a polygon wkt: {s[:40]}")
    rings = []
    for m in _RING_RE.finditer(s):
        pts = []
        for pair in m.group(1).split(","):
            parts = pair.split()
            if len(parts) >= 2:
                pts.append((float(parts[0]), float(parts[1])))
        if len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        if pts:
            rings.append(np.asarray(pts, dtype=np.float64))
    if not rings:
        raise ValueError(f"no rings parsed from wkt: {s[:40]}")
    offsets = np.zeros(len(rings) + 1, dtype=np.int64)
    for i, r in enumerate(rings):
        offsets[i + 1] = offsets[i] + len(r)
    return np.concatenate(rings, axis=0), offsets


def polygon_wkt(coords: np.ndarray, offsets: np.ndarray | None = None) -> str:
    """Packed rings -> POLYGON wkt (first ring exterior, rest holes)."""
    if offsets is None:
        offsets = np.asarray([0, len(coords)], dtype=np.int64)
    rings = []
    for i in range(len(offsets) - 1):
        r = coords[offsets[i]:offsets[i + 1]]
        pts = ", ".join(f"{x:.10g} {y:.10g}" for x, y in r)
        first = f"{r[0, 0]:.10g} {r[0, 1]:.10g}"
        rings.append(f"({pts}, {first})")
    return "POLYGON (" + ", ".join(rings) + ")"


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of one ring (positive = CCW)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_area(coords: np.ndarray, offsets: np.ndarray | None = None) -> float:
    """Unsigned area: |exterior| minus |holes| by signed-sum convention."""
    if offsets is None:
        offsets = np.asarray([0, len(coords)], dtype=np.int64)
    total = 0.0
    for i in range(len(offsets) - 1):
        total += ring_area(coords[offsets[i]:offsets[i + 1]])
    return abs(total)


def envelope(coords: np.ndarray):
    """(xmin, ymin, xmax, ymax)."""
    return (
        float(coords[:, 0].min()),
        float(coords[:, 1].min()),
        float(coords[:, 0].max()),
        float(coords[:, 1].max()),
    )


def envelopes_intersect(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1):
    """Vectorized closed-envelope overlap test — the cheap prefilter the
    reference gets from the OGR spatial index; written explicitly before any
    UDF so Catalyst keeps it JVM-side when used as a column expression."""
    return (
        (np.asarray(ax0) <= np.asarray(bx1))
        & (np.asarray(ax1) >= np.asarray(bx0))
        & (np.asarray(ay0) <= np.asarray(by1))
        & (np.asarray(ay1) >= np.asarray(by0))
    )


def _winding_number(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Winding number of each point w.r.t. one ring. Vectorized over points
    and edges: O(P*E) numpy ops, no Python loop over points."""
    x0 = ring[:, 0][None, :]
    y0 = ring[:, 1][None, :]
    x1 = np.roll(ring[:, 0], -1)[None, :]
    y1 = np.roll(ring[:, 1], -1)[None, :]
    px = px[:, None]
    py = py[:, None]
    # cross > 0 means point left of edge (going 0 -> 1)
    cross = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
    upward = (y0 <= py) & (y1 > py) & (cross > 0)
    downward = (y0 > py) & (y1 <= py) & (cross < 0)
    return (upward.sum(axis=1) - downward.sum(axis=1)).astype(np.int64)


def points_in_ring(px, py, ring: np.ndarray) -> np.ndarray:
    return _winding_number(np.asarray(px, dtype=np.float64),
                           np.asarray(py, dtype=np.float64), ring) != 0


def points_in_polygon(px, py, coords: np.ndarray, offsets: np.ndarray | None = None,
                      batch_edges: int = 4096) -> np.ndarray:
    """Point-in-polygon (winding number, nonzero rule) over packed rings.

    The exact-refine predicate of the spatial join (J2 analog of
    ``geom.Intersects`` refine, /root/reference/pgc_mosaic_query_index.py:322),
    for the point-shaped fact side (geocoded pages).
    Memory-bounded: edge dimension processed in chunks of ``batch_edges``.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if offsets is None:
        offsets = np.asarray([0, len(coords)], dtype=np.int64)
    wn = np.zeros(len(px), dtype=np.int64)
    for i in range(len(offsets) - 1):
        ring = coords[offsets[i]:offsets[i + 1]]
        if len(px) * len(ring) <= batch_edges * 1024:
            wn += _winding_number(px, py, ring)
        else:
            step = max(1, batch_edges * 1024 // max(1, len(ring)))
            for s in range(0, len(px), step):
                wn[s:s + step] += _winding_number(px[s:s + step], py[s:s + step], ring)
    return wn != 0


def does_cross_180(coords: np.ndarray) -> bool:
    """True if the polygon's longitudes span more than 180 degrees — exact
    semantics of ``doesCross180`` (/root/reference/lib/utils.py:537-558:
    ``max(x) - min(x) > 180``)."""
    if len(coords) == 0:
        return False
    return float(coords[:, 0].max() - coords[:, 0].min()) > 180.0


def wrap_geometry_180(ring: np.ndarray):
    """Split a single-ring lon/lat polygon crossing the anti-meridian into
    (west_ring, east_ring) — faithful reimplementation of
    ``getWrappedGeometry`` (/root/reference/lib/utils.py:561-645):

    * vertices with x < 0 go to the west part, x >= 0 to the east part
      (points on 0.0 go east), preserving original order;
    * every segment whose endpoints have opposite sign gets an interpolated
      crossing point at x = 180 (west copy gets x = -180), with y from linear
      interpolation in +360-shifted x space.

    Returns a list of 1..2 rings (empty sides dropped).
    """
    west: list[tuple[float, float]] = []
    east: list[tuple[float, float]] = []
    n = len(ring)
    for i in range(n):
        x1, y1 = float(ring[i][0]), float(ring[i][1])
        x2, y2 = float(ring[(i + 1) % n][0]), float(ring[(i + 1) % n][1])
        (west if x1 < 0.0 else east).append((x1, y1))
        sign1 = (x1 > 0) - (x1 < 0)
        sign2 = (x2 > 0) - (x2 < 0)
        if sign1 != sign2:
            x1s = x1 + 360.0 if x1 < 0.0 else x1
            x2s = x2 + 360.0 if x2 < 0.0 else x2
            run = x2s - x1s
            if run == 0.0:
                raise ZeroDivisionError("degenerate 180-crossing segment")
            y3 = ((180.0 - x1s) * (y2 - y1)) / run + y1
            west.append((-180.0, y3))
            east.append((180.0, y3))
    out = []
    for pts in (west, east):
        if pts:
            out.append(np.asarray(pts, dtype=np.float64))
    return out
