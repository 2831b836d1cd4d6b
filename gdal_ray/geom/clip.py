"""Polygon clipping kernels for layer algebra — pure numpy.

Re-expresses the geometric core of OGR's layer-algebra methods
(Intersection/Union/SymDifference/Update/Clip/Erase,
ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-7188 — there delegated to
GEOS boolean ops) with from-scratch kernels:

- `sh_clip`: Sutherland–Hodgman polygon clipping.  Exact for any
  SIMPLE subject polygon against a CONVEX clip polygon: the subject is
  clipped successively against each clip half-plane.  A concave
  subject split into several components by the clip comes back as one
  ring with degenerate connecting edges — its shoelace area is still
  exactly the intersection area.
- `convex_difference_pieces`: subject minus a convex clip as a list of
  DISJOINT convex-corner pieces, via the standard half-plane
  decomposition: piece_i = subject ∩ outside(e_i) ∩ inside(e_0..e_i-1).
  The pieces partition subject\\clip exactly (no overlap, no gap).
- `difference_many`: subject minus a SEQUENCE of convex clips
  (successive decomposition) — the kernel behind Erase/Update and the
  leftover features of Union/SymDifference/Identity.

The method (clip) layer must be convex polygons; the reference has no
such restriction (GEOS) — decompose concave method features upstream.
All coordinates float64; `EPS` guards orientation/degeneracy tests.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-9


def _open_ring(ring: np.ndarray) -> np.ndarray:
    """Drop a repeated closing vertex if present.  The comparison must
    be (near-)exact: np.allclose's default rtol=1e-5 swallowed a REAL
    vertex of any sliver thinner than ~1e-5·|coord| and halved its
    area (found by hypothesis); closing vertices are written as exact
    copies, so a tight absolute tolerance is correct."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and bool(np.all(np.abs(ring[0] - ring[-1])
                                      <= 1e-12)):
        ring = ring[:-1]
    return ring


def ring_area(ring: np.ndarray) -> float:
    """Shoelace area (positive for CCW) of an open ring."""
    r = _open_ring(ring)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    r = _open_ring(ring)
    return r[::-1] if ring_area(r) < 0 else r


def _clip_halfplane(pts: np.ndarray, a: np.ndarray, b: np.ndarray,
                    keep_left: bool = True) -> np.ndarray:
    """One Sutherland–Hodgman pass: keep the part of polygon ``pts``
    on the left (or right) side of the directed line a→b."""
    n = len(pts)
    if n == 0:
        return pts
    d = b - a
    cross = d[0] * (pts[:, 1] - a[1]) - d[1] * (pts[:, 0] - a[0])
    if not keep_left:
        cross = -cross
    inside = cross >= -EPS
    if inside.all():
        return pts
    if not inside.any():
        return pts[:0]
    out = []
    for i in range(n):
        j = (i + 1) % n
        p, q = pts[i], pts[j]
        ci, cj = cross[i], cross[j]
        if inside[i]:
            out.append(p)
        if inside[i] != inside[j]:
            # edge crosses the line: parameter where cross == 0
            t = ci / (ci - cj)
            out.append(p + t * (q - p))
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def _dedupe_ring(pts: np.ndarray) -> np.ndarray:
    """Remove consecutive (near-)duplicate vertices."""
    if len(pts) < 2:
        return pts
    keep = np.r_[True, np.any(np.abs(np.diff(pts, axis=0)) > EPS, axis=1)]
    pts = pts[keep]
    if len(pts) >= 2 and np.all(np.abs(pts[0] - pts[-1]) <= EPS):
        pts = pts[:-1]
    return pts


def sh_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """subject ∩ clip (clip CONVEX).  Returns an open CCW ring; empty
    array (0,2) when the intersection has no area."""
    out = ensure_ccw(subject)
    cl = ensure_ccw(clip)
    m = len(cl)
    for i in range(m):
        out = _clip_halfplane(out, cl[i], cl[(i + 1) % m], keep_left=True)
        if len(out) == 0:
            break
    out = _dedupe_ring(out)
    return out if abs(ring_area(out)) > EPS else out[:0]


def convex_difference_pieces(subject: np.ndarray,
                             clip: np.ndarray) -> list[np.ndarray]:
    """subject \\ clip as a list of disjoint open CCW rings.

    piece_i = subject ∩ outside(edge_i) ∩ inside(edge_0..edge_{i-1});
    the half-plane wedges partition the complement of the convex clip,
    so the pieces partition the difference exactly."""
    subj = ensure_ccw(subject)
    cl = ensure_ccw(clip)
    m = len(cl)
    pieces = []
    inside_so_far = subj
    for i in range(m):
        a, b = cl[i], cl[(i + 1) % m]
        piece = _clip_halfplane(inside_so_far, a, b, keep_left=False)
        piece = _dedupe_ring(piece)
        if abs(ring_area(piece)) > EPS:
            pieces.append(piece)
        inside_so_far = _clip_halfplane(inside_so_far, a, b, keep_left=True)
        if len(inside_so_far) == 0:
            break
    return pieces


def difference_many(subject: np.ndarray,
                    clips: list[np.ndarray]) -> list[np.ndarray]:
    """subject minus every polygon in ``clips`` (each convex), as
    disjoint pieces: successive application of the piece decomposition."""
    pieces = [ensure_ccw(subject)]
    for cl in clips:
        nxt: list[np.ndarray] = []
        for p in pieces:
            nxt.extend(convex_difference_pieces(p, cl))
        pieces = nxt
        if not pieces:
            break
    return pieces


def pieces_area(pieces: list[np.ndarray]) -> float:
    return float(sum(abs(ring_area(p)) for p in pieces))


def is_convex(ring: np.ndarray) -> bool:
    """All cross products of consecutive edges share a sign (within
    EPS) — convexity test for an open ring."""
    r = _open_ring(np.asarray(ring, dtype=np.float64))
    if len(r) < 4:
        return True
    a = np.roll(r, -1, axis=0) - r
    b = np.roll(a, -1, axis=0)
    cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    return bool((cross >= -EPS).all() or (cross <= EPS).all())


def ear_clip_triangulate(ring: np.ndarray) -> list[np.ndarray]:
    """Simple-polygon triangulation by ear clipping (O(n²), the
    classic algorithm) — decomposes a CONCAVE polygon into disjoint
    triangles so it can serve as a clip region for the convex-clip
    kernels.  Input: simple ring, no holes, any orientation."""
    r = ensure_ccw(ring)
    n = len(r)
    if n < 3:
        return []
    if n == 3 or is_convex(r):
        return [r] if n == 3 else [r]
    idx = list(range(n))

    def cross(o, a, b):
        return ((r[a, 0] - r[o, 0]) * (r[b, 1] - r[o, 1])
                - (r[a, 1] - r[o, 1]) * (r[b, 0] - r[o, 0]))

    def point_in_tri(p, a, b, c):
        # INCLUSIVE containment: a reflex vertex exactly on the
        # candidate diagonal must block the ear (a polygon edge can
        # cross the triangle interior with no vertex strictly inside)
        # — EXCEPT points coinciding with a triangle corner: bridged
        # hole rings (bridge_holes) duplicate the two bridge vertices,
        # and the duplicate of a corner must not block its own ear.
        if (abs(p[0] - r[a, 0]) <= EPS and abs(p[1] - r[a, 1]) <= EPS) \
           or (abs(p[0] - r[b, 0]) <= EPS and abs(p[1] - r[b, 1]) <= EPS) \
           or (abs(p[0] - r[c, 0]) <= EPS and abs(p[1] - r[c, 1]) <= EPS):
            return False
        d1 = (r[a, 0] - p[0]) * (r[b, 1] - p[1]) \
            - (r[a, 1] - p[1]) * (r[b, 0] - p[0])
        d2 = (r[b, 0] - p[0]) * (r[c, 1] - p[1]) \
            - (r[b, 1] - p[1]) * (r[c, 0] - p[0])
        d3 = (r[c, 0] - p[0]) * (r[a, 1] - p[1]) \
            - (r[c, 1] - p[1]) * (r[a, 0] - p[0])
        return (d1 >= -EPS) and (d2 >= -EPS) and (d3 >= -EPS)

    tris: list[np.ndarray] = []
    guard = 0
    while len(idx) > 3 and guard < 10 * n * n:
        guard += 1
        m = len(idx)
        # only REFLEX vertices can block an ear (the standard test —
        # convex vertices on the boundary are harmless)
        reflex = {idx[k] for k in range(m)
                  if cross(idx[(k - 1) % m], idx[k],
                           idx[(k + 1) % m]) <= EPS}
        clipped = False
        for k in range(m):
            a, b, c = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            if cross(a, b, c) <= EPS:
                continue  # reflex or degenerate corner
            if any(point_in_tri(r[j], a, b, c)
                   for j in reflex if j not in (a, b, c)):
                continue
            tris.append(np.array([r[a], r[b], r[c]]))
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            # pop a DEGENERATE corner (zero-area: collinear run or the
            # residue of a doubled bridge edge) without emitting — the
            # path a→c is geometrically identical, so area is preserved
            for k in range(m):
                a, b, c = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
                if abs(cross(a, b, c)) <= EPS:
                    idx.pop(k)
                    clipped = True
                    break
        if not clipped:
            break  # numerically stuck: emit remainder as one piece
    if len(idx) >= 3 and abs(ring_area(r[np.asarray(idx, np.int64)])) > EPS:
        tris.append(r[np.asarray(idx, dtype=np.int64)])
    return tris


def _visible_outer_vertex(out: np.ndarray, M: np.ndarray) -> int:
    """Index of a vertex of ``out`` (CCW, weakly simple) visible from
    interior point M, found with the public ray-cast construction
    (Eberly, "Triangulation by Ear Clipping" §5): shoot +x from M,
    take the nearest edge crossing, candidate P = that edge's
    larger-x endpoint, then demote to the angle-minimizing reflex
    vertex inside triangle (M, I, P) if one exists."""
    n = len(out)
    a = out
    b = np.roll(out, -1, axis=0)
    dy = b[:, 1] - a[:, 1]
    # edges properly crossing the horizontal line y = M_y, half-open
    # ([min,max) on y) so shared vertices count once
    lo = np.minimum(a[:, 1], b[:, 1])
    hi = np.maximum(a[:, 1], b[:, 1])
    crossing = (lo <= M[1]) & (M[1] < hi)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(np.abs(dy) > 1e-300, (M[1] - a[:, 1]) / dy, np.nan)
    xi = a[:, 0] + s * (b[:, 0] - a[:, 0])
    valid = crossing & (xi >= M[0] - EPS)
    if not valid.any():  # fall back: nearest vertex to the right
        cand = np.flatnonzero(out[:, 0] >= M[0])
        if not len(cand):
            cand = np.arange(n)
        d = np.hypot(out[cand, 0] - M[0], out[cand, 1] - M[1])
        return int(cand[np.argmin(d)])
    i = int(np.flatnonzero(valid)[np.argmin(xi[valid])])
    I = np.array([xi[i], M[1]])
    j = (i + 1) % n
    p = i if out[i, 0] > out[j, 0] else j
    # reflex vertices strictly inside triangle (M, I, P) are closer
    # obstructions; pick the one minimizing the angle to the +x ray
    prev = np.roll(out, 1, axis=0)
    nxt = np.roll(out, -1, axis=0)
    cr = (out[:, 0] - prev[:, 0]) * (nxt[:, 1] - out[:, 1]) \
        - (out[:, 1] - prev[:, 1]) * (nxt[:, 0] - out[:, 0])
    reflex = cr <= EPS

    def in_tri(pt):
        t1, t2, t3 = M, I, out[p]
        d1 = (t1[0]-pt[0])*(t2[1]-pt[1]) - (t1[1]-pt[1])*(t2[0]-pt[0])
        d2 = (t2[0]-pt[0])*(t3[1]-pt[1]) - (t2[1]-pt[1])*(t3[0]-pt[0])
        d3 = (t3[0]-pt[0])*(t1[1]-pt[1]) - (t3[1]-pt[1])*(t1[0]-pt[0])
        has_neg = (d1 < -EPS) or (d2 < -EPS) or (d3 < -EPS)
        has_pos = (d1 > EPS) or (d2 > EPS) or (d3 > EPS)
        return not (has_neg and has_pos)

    best = p
    best_key = None
    for k in range(n):
        if k == p or not reflex[k]:
            continue
        v = out[k]
        if np.all(np.abs(v - out[p]) <= EPS) or not in_tri(v):
            continue
        dx, dyv = v[0] - M[0], v[1] - M[1]
        dist = float(np.hypot(dx, dyv))
        if dist <= EPS:
            continue
        key = (abs(dyv) / max(dist, 1e-300), dist)  # sin(angle), dist
        if best_key is None or key < best_key:
            best, best_key = k, key
    return int(best)


def bridge_holes(outer: np.ndarray,
                 holes: list[np.ndarray]) -> np.ndarray:
    """Merge hole rings into the outer ring with doubled bridge edges
    → ONE weakly simple CCW ring with the same interior, triangulable
    by `ear_clip_triangulate`.  Public construction (Eberly,
    "Triangulation by Ear Clipping"; also used by mapbox/earcut):
    holes processed by decreasing max-x, each spliced at a visible
    outer vertex; holes traverse CW so winding stays consistent."""
    out = ensure_ccw(outer)
    hs = sorted((ensure_ccw(h)[::-1] for h in holes),
                key=lambda h: -float(h[:, 0].max()))
    for h in hs:
        if len(h) < 3:
            continue
        m = int(np.argmax(h[:, 0]))
        M = h[m]
        p = _visible_outer_vertex(out, M)
        hrot = np.vstack([h[m:], h[:m]])
        out = np.vstack([out[:p + 1], hrot, h[m:m + 1],
                         out[p:p + 1], out[p + 1:]])
    return out


def triangulate_with_holes(outer: np.ndarray,
                           holes: list[np.ndarray]) -> list[np.ndarray]:
    """outer minus holes (any shape, incl. CONCAVE holes) as disjoint
    triangles: bridge the holes into one weakly simple ring, then ear
    clip."""
    if not holes:
        return ear_clip_triangulate(outer)
    return ear_clip_triangulate(bridge_holes(outer, holes))
