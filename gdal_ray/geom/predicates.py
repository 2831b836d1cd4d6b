"""Vectorized point↔polygon predicates (GEOS-compatible semantics).

Re-implements, in numpy, the two predicates the spatial-join path of the
reference relies on (``OGRGeometry::Intersects/Within/Contains``,
ogr/ogr_geometry.h:546-557, delegated to GEOS):

- ``intersects`` for point vs polygon  == point covered by the polygon
  (interior OR boundary),
- ``within``     for point vs polygon  == point in the interior only.

``PreparedPolygon`` plays the role of GEOS prepared geometries
(``OGRCreatePreparedGeometry`` used by the layer-algebra join,
ogr/ogrlayer.cpp:5512-5520): edge arrays are extracted once, then many
points are tested per call with no per-point Python.

Algorithm: even-odd crossing number with the half-open edge rule
(a crossing counts when ``(y0 > p) != (y1 > p)``), plus an exact
point-on-segment test for the boundary mask.  Holes are handled by the
even-odd rule automatically; boundary-of-hole counts as boundary.
"""

from __future__ import annotations

import numpy as np

from . import wkb as _wkb


class PreparedPolygon:
    """One polygon (or multipolygon) prepared for many-point queries."""

    __slots__ = ("x0", "y0", "x1", "y1", "bounds")

    def __init__(self, rings: list[np.ndarray]):
        segs0 = []
        segs1 = []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 2:
                continue
            if not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            segs0.append(r[:-1])
            segs1.append(r[1:])
        a = np.concatenate(segs0) if segs0 else np.empty((0, 2))
        b = np.concatenate(segs1) if segs1 else np.empty((0, 2))
        self.x0, self.y0 = a[:, 0].copy(), a[:, 1].copy()
        self.x1, self.y1 = b[:, 0].copy(), b[:, 1].copy()
        if len(a):
            self.bounds = (
                min(a[:, 0].min(), b[:, 0].min()),
                min(a[:, 1].min(), b[:, 1].min()),
                max(a[:, 0].max(), b[:, 0].max()),
                max(a[:, 1].max(), b[:, 1].max()),
            )
        else:
            self.bounds = (np.inf, np.inf, -np.inf, -np.inf)

    @classmethod
    def from_wkb(cls, blob: bytes) -> "PreparedPolygon":
        g = _wkb.decode(blob)
        if g["type"] == "Polygon":
            return cls(g["coordinates"])
        if g["type"] == "MultiPolygon":
            rings = [r for poly in g["coordinates"] for r in poly]
            return cls(rings)
        raise ValueError(f"not a polygon: {g['type']}")

    def _masks(self, px: np.ndarray, py: np.ndarray, chunk: int = 0):
        """(interior_or_boundary, boundary) masks for point arrays."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        x0, y0, x1, y1 = self.x0, self.y0, self.x1, self.y1
        n_pts, n_seg = len(px), len(x0)
        inside = np.zeros(n_pts, dtype=bool)
        boundary = np.zeros(n_pts, dtype=bool)
        if n_seg == 0 or n_pts == 0:
            return inside, boundary
        # chunk points so the (pts × segs) broadcast stays in cache/heap
        step = chunk or max(1, int(2_000_000 // max(1, n_seg)))
        for s in range(0, n_pts, step):
            X = px[s : s + step, None]
            Y = py[s : s + step, None]
            # crossing number: half-open in y, strict x test at the
            # intersection abscissa (standard even-odd ray cast)
            cond = (y0 > Y) != (y1 > Y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x0 + (Y - y0) * (x1 - x0) / (y1 - y0)
            crossings = np.count_nonzero(cond & (X < xint), axis=1)
            inside[s : s + step] = (crossings & 1).astype(bool)
            # boundary: collinear and within segment bbox
            cross = (x1 - x0) * (Y - y0) - (y1 - y0) * (X - x0)
            on = (
                (cross == 0.0)
                & (X >= np.minimum(x0, x1))
                & (X <= np.maximum(x0, x1))
                & (Y >= np.minimum(y0, y1))
                & (Y <= np.maximum(y0, y1))
            )
            boundary[s : s + step] = on.any(axis=1)
        return inside | boundary, boundary

    def covers(self, px, py) -> np.ndarray:
        """Point intersects polygon (interior or boundary) — the
        predicate of the layer-algebra candidate filter
        (``FilterGeometry`` → Intersects, ogr/ogrlayer.cpp:4004-4075)."""
        cov, _ = self._masks(px, py)
        return cov

    def contains_properly(self, px, py) -> np.ndarray:
        """Point strictly inside (GEOS ``Within`` for a point)."""
        cov, bnd = self._masks(px, py)
        return cov & ~bnd

    def bbox_mask(self, px, py) -> np.ndarray:
        """Envelope pre-filter — phase 1 of the reference's two-phase
        spatial filter (envelope overlap then exact test,
        ogr/ogrlayer.cpp:4004-4075)."""
        minx, miny, maxx, maxy = self.bounds
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        return (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)


def points_in_polygon_wkb(px, py, blob: bytes, boundary: bool = True) -> np.ndarray:
    """One-shot helper: mask of points covered by (or strictly within)
    the WKB polygon."""
    prep = PreparedPolygon.from_wkb(blob)
    return prep.covers(px, py) if boundary else prep.contains_properly(px, py)
