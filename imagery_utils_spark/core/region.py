"""Scanline region algebra — exact planar boolean ops without a GEOS dependency.

The cutline operator (/root/reference/lib/mosaic.py:743-789) needs
``Difference / Intersection / Union / Area / IsEmpty / Intersects`` over
footprint geometries. The reference gets these from OGR/GEOS; this engine
represents a region as a set of horizontal *slabs*, each carrying a sorted
list of disjoint x-intervals:

    Region = [(y0, y1, [(x0, x1), ...]), ...]   # slabs sorted, disjoint in y

Boolean ops align the two slab decompositions on the union of their y-breaks
and apply 1-D interval algebra per elementary slab — exact closed-form
arithmetic, O(n log n), fully deterministic.

Fidelity note: this is *exact* for rectilinear polygons. For polygons with
slanted edges, ``from_polygon`` scanline-fills with a configurable slab
subdivision — the same class of approximation the reference itself bakes in:
its "exact" footprints are scanline staircases sampled every ``step`` rows
(``GetExactTrimmedGeom``, /root/reference/lib/mosaic.py:911-981, default
--cutline-step 2), so reference cutline geometry is already slab-shaped.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Region"]

Interval = tuple[float, float]
Slab = tuple[float, float, list[Interval]]


def _ivals_union(a: list[Interval], b: list[Interval]) -> list[Interval]:
    out: list[Interval] = []
    for x0, x1 in sorted(a + b):
        if out and x0 <= out[-1][1]:
            if x1 > out[-1][1]:
                out[-1] = (out[-1][0], x1)
        else:
            out.append((x0, x1))
    return out


def _ivals_intersect(a: list[Interval], b: list[Interval]) -> list[Interval]:
    out: list[Interval] = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo < hi:
            out.append((lo, hi))
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def _ivals_difference(a: list[Interval], b: list[Interval]) -> list[Interval]:
    out: list[Interval] = []
    j = 0
    for x0, x1 in a:
        cur = x0
        while j < len(b) and b[j][1] <= cur:
            j += 1
        k = j
        while k < len(b) and b[k][0] < x1:
            if b[k][0] > cur:
                out.append((cur, b[k][0]))
            cur = max(cur, b[k][1])
            if cur >= x1:
                break
            k += 1
        if cur < x1:
            out.append((cur, x1))
    return out


class Region:
    """Immutable slab-decomposed planar region."""

    __slots__ = ("slabs",)

    def __init__(self, slabs: list[Slab] | None = None):
        self.slabs: list[Slab] = slabs or []

    # -------------------------------------------------- constructors
    @classmethod
    def empty(cls) -> "Region":
        return cls([])

    @classmethod
    def from_rect(cls, x0: float, y0: float, x1: float, y1: float) -> "Region":
        if x0 >= x1 or y0 >= y1:
            return cls.empty()
        return cls([(float(y0), float(y1), [(float(x0), float(x1))])])

    @classmethod
    def from_polygon(cls, coords: np.ndarray, offsets: np.ndarray | None = None,
                     max_slab: float | None = None) -> "Region":
        """Scanline fill (even-odd rule) of packed rings.

        Slab breaks = unique vertex ys (exact for rectilinear inputs);
        ``max_slab`` additionally subdivides tall slabs to bound the staircase
        error on slanted edges (analog of ``--cutline-step``,
        /root/reference/pgc_mosaic.py:82-83). Each slab's x-crossings are
        evaluated on the slab's midline.
        """
        coords = np.asarray(coords, dtype=np.float64)
        if offsets is None:
            offsets = np.asarray([0, len(coords)], dtype=np.int64)
        # collect edges (x0,y0,x1,y1) from all rings, skipping horizontal ones
        ex0, ey0, ex1, ey1 = [], [], [], []
        for i in range(len(offsets) - 1):
            ring = coords[offsets[i]:offsets[i + 1]]
            nxt = np.roll(ring, -1, axis=0)
            keep = ring[:, 1] != nxt[:, 1]
            ex0.append(ring[keep, 0]); ey0.append(ring[keep, 1])
            ex1.append(nxt[keep, 0]); ey1.append(nxt[keep, 1])
        if not ex0 or sum(len(a) for a in ex0) == 0:
            return cls.empty()
        ex0 = np.concatenate(ex0); ey0 = np.concatenate(ey0)
        ex1 = np.concatenate(ex1); ey1 = np.concatenate(ey1)

        ys = np.unique(coords[:, 1])
        breaks = [float(ys[0])]
        for k in range(len(ys) - 1):
            lo, hi = float(ys[k]), float(ys[k + 1])
            if max_slab is not None and hi - lo > max_slab:
                nsub = int(np.ceil((hi - lo) / max_slab))
                breaks.extend(lo + (hi - lo) * (np.arange(1, nsub + 1) / nsub))
            else:
                breaks.append(hi)
        breaks = np.asarray(breaks, dtype=np.float64)

        slabs: list[Slab] = []
        mid = (breaks[:-1] + breaks[1:]) / 2.0
        lo_y = np.minimum(ey0, ey1)
        hi_y = np.maximum(ey0, ey1)
        for k in range(len(mid)):
            m = mid[k]
            act = (lo_y <= m) & (hi_y > m)
            if not act.any():
                continue
            t = (m - ey0[act]) / (ey1[act] - ey0[act])
            xs = np.sort(ex0[act] + t * (ex1[act] - ex0[act]))
            ivals = [(float(xs[i]), float(xs[i + 1]))
                     for i in range(0, len(xs) - 1, 2) if xs[i] < xs[i + 1]]
            if ivals:
                slabs.append((float(breaks[k]), float(breaks[k + 1]), ivals))
        return cls(slabs)._coalesce()

    @classmethod
    def from_wkt(cls, wkt: str, max_slab: float | None = None) -> "Region":
        from .geom import parse_wkt_polygon
        coords, offsets = parse_wkt_polygon(wkt)
        return cls.from_polygon(coords, offsets, max_slab=max_slab)

    # -------------------------------------------------- helpers
    def _coalesce(self) -> "Region":
        """Merge vertically adjacent slabs with identical interval lists."""
        out: list[Slab] = []
        for y0, y1, iv in self.slabs:
            if out and out[-1][1] == y0 and out[-1][2] == iv:
                out[-1] = (out[-1][0], y1, iv)
            else:
                out.append((y0, y1, list(iv)))
        return Region(out)

    def _breaks(self) -> list[float]:
        bs: set[float] = set()
        for y0, y1, _ in self.slabs:
            bs.add(y0)
            bs.add(y1)
        return sorted(bs)

    def _ivals_at(self, y0: float) -> list[Interval]:
        """Intervals of the slab starting at or covering midpoint of [y0,·)."""
        for s0, s1, iv in self.slabs:
            if s0 <= y0 < s1:
                return iv
        return []

    def _binary(self, other: "Region", op) -> "Region":
        breaks = sorted(set(self._breaks()) | set(other._breaks()))
        slabs: list[Slab] = []
        for k in range(len(breaks) - 1):
            y0, y1 = breaks[k], breaks[k + 1]
            iv = op(self._ivals_at(y0), other._ivals_at(y0))
            if iv:
                slabs.append((y0, y1, iv))
        return Region(slabs)._coalesce()

    # -------------------------------------------------- boolean algebra
    def union(self, other: "Region") -> "Region":
        if not self.slabs:
            return Region(list(other.slabs))
        if not other.slabs:
            return Region(list(self.slabs))
        return self._binary(other, _ivals_union)

    def intersection(self, other: "Region") -> "Region":
        if not self.slabs or not other.slabs:
            return Region.empty()
        return self._binary(other, _ivals_intersect)

    def difference(self, other: "Region") -> "Region":
        if not self.slabs:
            return Region.empty()
        if not other.slabs:
            return Region(list(self.slabs))
        return self._binary(other, _ivals_difference)

    # -------------------------------------------------- predicates / measures
    def is_empty(self) -> bool:
        return not self.slabs

    def area(self) -> float:
        total = 0.0
        for y0, y1, iv in self.slabs:
            total += (y1 - y0) * sum(x1 - x0 for x0, x1 in iv)
        return total

    def intersects(self, other: "Region") -> bool:
        # envelope early-exit, then slab sweep with early return
        if self.is_empty() or other.is_empty():
            return False
        a = self.bounds()
        b = other.bounds()
        if a[0] >= b[2] or b[0] >= a[2] or a[1] >= b[3] or b[1] >= a[3]:
            return False
        return not self.intersection(other).is_empty()

    def bounds(self):
        x0 = min(iv[0][0] for _, _, iv in self.slabs)
        x1 = max(iv[-1][1] for _, _, iv in self.slabs)
        return (x0, self.slabs[0][0], x1, self.slabs[-1][1])

    def __eq__(self, other) -> bool:
        return isinstance(other, Region) and self.slabs == other.slabs

    def __repr__(self) -> str:
        return f"Region({len(self.slabs)} slabs, area={self.area():.6g})"
