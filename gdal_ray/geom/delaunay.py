"""Delaunay triangulation (Bowyer–Watson) + barycentric interpolation.

The reference's linear gridding (GDALGridLinear, alg/gdalgrid.cpp —
there via QHull's Delaunay, alg/delaunay.c) interpolates each grid
node inside the triangulation of the scattered points; nodes outside
the convex hull get NODATA (or nearest within a radius).

This is the BROADCAST-side kernel: the scattered reference layer is
the small side (ray.put once), the triangulation is built once per
actor in __init__ — O(n²) incremental Bowyer–Watson, fine for the
broadcast-layer scale; beyond ~10^4 points bucket the reference side
by cell prefix (documented scale path in stages/knn.py).

Pure numpy; no scipy/QHull in this environment.
"""

from __future__ import annotations

import numpy as np


def _circumcircle_contains(tri_pts: np.ndarray, p: np.ndarray) -> bool:
    """Is p strictly inside the circumcircle of the 3 points?  The
    standard incircle determinant (positive for CCW triangles)."""
    a, b, c = tri_pts
    ax, ay = a - p
    bx, by = b - p
    cx, cy = c - p
    det = ((ax * ax + ay * ay) * (bx * cy - cx * by)
           - (bx * bx + by * by) * (ax * cy - cx * ay)
           + (cx * cx + cy * cy) * (ax * by - bx * ay))
    return det > 1e-12


def _ccw(pts: np.ndarray) -> np.ndarray:
    a, b, c = pts
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def delaunay(points: np.ndarray) -> np.ndarray:
    """(n,2) points → (m,3) triangle vertex-index array (Bowyer–Watson
    with a super-triangle; duplicate points must be deduped upstream)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # super-triangle far outside the data
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    r = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0) * 100.0
    sup = np.array([[cx - 2 * r, cy - r], [cx + 2 * r, cy - r],
                    [cx, cy + 2 * r]])
    allp = np.vstack([pts, sup])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    for i in range(n):
        p = allp[i]
        bad = [t for t in tris
               if _circumcircle_contains(allp[list(t)], p)]
        # boundary polygon of the cavity: edges appearing exactly once
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        tris = [t for t in tris if t not in bad]
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                t = (u, v, i)
                if _ccw(allp[list(t)]) < 0:
                    t = (v, u, i)
                tris.append(t)
    out = [t for t in tris if max(t) < n]
    return np.asarray(out, dtype=np.int64).reshape(-1, 3)


class LinearInterpolator:
    """Triangulation + per-query barycentric interpolation; NaN outside
    the convex hull (GDALGridLinear NODATA semantics)."""

    def __init__(self, x: np.ndarray, y: np.ndarray, z: np.ndarray):
        # dedupe exact duplicates (Bowyer–Watson needs distinct points)
        pts = np.column_stack([np.asarray(x, np.float64),
                               np.asarray(y, np.float64)])
        _, keep = np.unique(pts, axis=0, return_index=True)
        keep = np.sort(keep)
        self.pts = pts[keep]
        self.z = np.asarray(z, np.float64)[keep]
        self.tris = delaunay(self.pts)
        t = self.pts[self.tris]  # (m, 3, 2)
        self.ax, self.ay = t[:, 0, 0], t[:, 0, 1]
        self.bx, self.by = t[:, 1, 0], t[:, 1, 1]
        self.cx, self.cy = t[:, 2, 0], t[:, 2, 1]
        self.den = ((self.by - self.cy) * (self.ax - self.cx)
                    + (self.cx - self.bx) * (self.ay - self.cy))

    def __call__(self, qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
        """Vectorized over queries × triangles (fine for broadcast-size
        triangulations; chunk queries upstream)."""
        qx = np.asarray(qx, np.float64)
        qy = np.asarray(qy, np.float64)
        out = np.full(len(qx), np.nan)
        if not len(self.tris):
            return out
        # barycentric coords for every (query, triangle)
        l1 = ((self.by - self.cy)[None, :] * (qx[:, None] - self.cx)
              + (self.cx - self.bx)[None, :] * (qy[:, None] - self.cy)) \
            / self.den[None, :]
        l2 = ((self.cy - self.ay)[None, :] * (qx[:, None] - self.cx)
              + (self.ax - self.cx)[None, :] * (qy[:, None] - self.cy)) \
            / self.den[None, :]
        l3 = 1.0 - l1 - l2
        eps = -1e-9
        inside = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        has = inside.any(axis=1)
        ti = np.argmax(inside, axis=1)
        rows = np.flatnonzero(has)
        t_sel = ti[rows]
        zv = self.z[self.tris]
        out[rows] = (l1[rows, t_sel] * zv[t_sel, 0]
                     + l2[rows, t_sel] * zv[t_sel, 1]
                     + l3[rows, t_sel] * zv[t_sel, 2])
        return out
