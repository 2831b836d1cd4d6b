"""Geometry unary operations over WKB — the `gdal vector *` step kernels.

Pure-numpy re-implementations of the reference's per-feature geometry
steps (pipeline steps apps/gdalalg_vector_{buffer,simplify,segmentize,
swap_xy,explode_collections,convex_hull}.cpp; GEOS-backed cores
ogr/ogrgeometry.cpp: Buffer:4949, Simplify:6778, ConvexHull:4449,
Centroid:6526).  Geometry stays WKB bytes in Arrow binary columns;
each op decodes → numpy ring math → re-encodes.

Semantics notes:
- area/centroid use the standard shoelace formulas (signed area; holes
  subtract automatically when wound opposite, and we force-normalize
  winding so they always subtract);
- convex_hull = Andrew's monotone chain (same result set as GEOS for
  point-distinct inputs; collinear boundary points dropped, as GEOS);
- simplify = Douglas-Peucker with the same tolerance meaning as
  GEOS Simplify (max perpendicular deviation);
- buffer is implemented for POINTS (n-segment circle approximation with
  GEOS's default 30 segments per quadrant convention, quadsegs arg);
  polygon buffering without GEOS is out of scope and raises.
"""

from __future__ import annotations

import numpy as np

from . import wkb as _wkb


# --- ring helpers -----------------------------------------------------------


def _close(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area (CCW positive)."""
    r = _close(ring)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_rings(g: dict) -> list[list[np.ndarray]]:
    """Normalize a decoded Polygon/MultiPolygon to a list of ring-lists."""
    if g["type"] == "Polygon":
        return [g["coordinates"]]
    if g["type"] == "MultiPolygon":
        return g["coordinates"]
    raise ValueError(f"not areal: {g['type']}")


def wkb_area(blob: bytes) -> float:
    """OGR_GEOM_AREA semantics (swq special field, ogr/ogr_p.h:134-140):
    exterior minus holes, summed over multipolygon parts; 0 for
    non-areal geometries."""
    g = _wkb.decode(blob)
    if g["type"] in ("Point", "LineString", "MultiPoint", "MultiLineString"):
        return 0.0
    total = 0.0
    for rings in polygon_rings(g):
        for i, ring in enumerate(rings):
            a = abs(ring_signed_area(ring))
            total += a if i == 0 else -a
    return total


def _path_length(arr: np.ndarray) -> float:
    d = np.diff(np.asarray(arr, np.float64), axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def wkb_length(blob: bytes) -> float:
    """ST_LENGTH: curve length of LineString/MultiLineString; 0 for
    points and areal geometries (OGR returns 0 for non-curves)."""
    g = _wkb.decode(blob)
    if g["type"] == "LineString":
        return _path_length(g["coordinates"])
    if g["type"] == "MultiLineString":
        return float(sum(_path_length(c) for c in g["coordinates"]))
    return 0.0


def wkb_perimeter(blob: bytes) -> float:
    """ST_PERIMETER: total ring length (exterior + holes) of areal
    geometries; 0 otherwise."""
    g = _wkb.decode(blob)
    if g["type"] not in ("Polygon", "MultiPolygon"):
        return 0.0
    total = 0.0
    for rings in polygon_rings(g):
        for ring in rings:
            total += _path_length(_close(np.asarray(ring)))
    return total


def wkb_envelope(blob: bytes) -> bytes:
    """ST_ENVELOPE: axis-aligned bounding box as a Polygon."""
    g = _wkb.decode(blob)
    pts, _paths = _coord_paths(g)
    minx, miny = pts[:, 0].min(), pts[:, 1].min()
    maxx, maxy = pts[:, 0].max(), pts[:, 1].max()
    return _wkb.box_polygon(float(minx), float(miny),
                            float(maxx), float(maxy))


def wkb_centroid(blob: bytes) -> tuple[float, float]:
    """Area-weighted centroid (holes subtract); point/line → mean of
    vertices (matching GEOS for the degenerate cases we use)."""
    g = _wkb.decode(blob)
    if g["type"] == "Point":
        return tuple(g["coordinates"])
    if g["type"] in ("LineString", "MultiPoint"):
        arr = np.asarray(g["coordinates"]).reshape(-1, 2)
        return float(arr[:, 0].mean()), float(arr[:, 1].mean())
    sa = 0.0
    sx = 0.0
    sy = 0.0
    for rings in polygon_rings(g):
        for i, ring in enumerate(rings):
            r = _close(ring)
            x, y = r[:, 0], r[:, 1]
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            a = 0.5 * float(np.sum(cross))
            cx = float(np.sum((x[:-1] + x[1:]) * cross)) / 6.0
            cy = float(np.sum((y[:-1] + y[1:]) * cross)) / 6.0
            sign = 1.0 if i == 0 else -1.0
            # normalize ring orientation so holes subtract
            flip = -1.0 if (a < 0) else 1.0
            sa += sign * flip * a
            sx += sign * flip * cx
            sy += sign * flip * cy
    if sa == 0.0:
        raise ValueError("zero-area polygon has no centroid")
    return sx / sa, sy / sa


def convex_hull_points(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull vertices (closed ring
    NOT included).  Collinear points on the hull are dropped."""
    p = np.unique(np.asarray(pts, dtype=np.float64).reshape(-1, 2), axis=0)
    if len(p) <= 2:
        return p
    # np.unique sorts lexicographically already
    def half(points):
        out = []
        for pt in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (pt[1] - o[1]) \
                        - (a[1] - o[1]) * (pt[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(pt)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def wkb_convex_hull(blob: bytes) -> bytes:
    g = _wkb.decode(blob)
    if g["type"] == "Point":
        return blob
    if g["type"] in ("LineString", "MultiPoint"):
        pts = np.asarray(g["coordinates"]).reshape(-1, 2)
    elif g["type"] == "Polygon":
        pts = np.vstack(g["coordinates"])
    elif g["type"] == "MultiPolygon":
        pts = np.vstack([r for rings in g["coordinates"] for r in rings])
    else:
        pts = np.vstack([np.asarray(c).reshape(-1, 2)
                         for c in g["coordinates"]])
    hull = convex_hull_points(pts)
    if len(hull) == 1:
        return _wkb.encode_point(*hull[0])
    if len(hull) == 2:
        return _wkb.encode_linestring(hull)
    return _wkb.encode_polygon([hull])


def douglas_peucker(coords: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas-Peucker (GEOS Simplify semantics: keep points
    whose perpendicular deviation exceeds tol)."""
    c = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    n = len(c)
    if n <= 2:
        return c
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = c[j] - c[i]
        L = np.hypot(*seg)
        mid = c[i + 1:j]
        if L == 0.0:
            d = np.hypot(mid[:, 0] - c[i][0], mid[:, 1] - c[i][1])
        else:
            d = np.abs(seg[0] * (c[i][1] - mid[:, 1])
                       - seg[1] * (c[i][0] - mid[:, 0])) / L
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return c[keep]


def wkb_simplify(blob: bytes, tolerance: float) -> bytes:
    g = _wkb.decode(blob)
    if g["type"] == "Point":
        return blob
    if g["type"] == "LineString":
        return _wkb.encode_linestring(douglas_peucker(g["coordinates"],
                                                      tolerance))
    if g["type"] == "Polygon":
        rings = [douglas_peucker(_close(r), tolerance)
                 for r in g["coordinates"]]
        return _wkb.encode_polygon([r for r in rings if len(r) >= 4])
    if g["type"] == "MultiPolygon":
        polys = []
        for rings in g["coordinates"]:
            rs = [douglas_peucker(_close(r), tolerance) for r in rings]
            rs = [r for r in rs if len(r) >= 4]
            if rs:
                polys.append(rs)
        return _wkb.encode_multipolygon(polys)
    raise ValueError(f"simplify: unsupported {g['type']}")


def segmentize_coords(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Insert vertices so no segment exceeds max_len (OGR Segmentize)."""
    c = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    if len(c) < 2:
        return c
    out = [c[:1]]
    for i in range(len(c) - 1):
        a, b = c[i], c[i + 1]
        d = float(np.hypot(*(b - a)))
        n = max(1, int(np.ceil(d / max_len)))
        ts = np.linspace(0.0, 1.0, n + 1)[1:]
        out.append(a[None, :] + ts[:, None] * (b - a)[None, :])
    return np.vstack(out)


def wkb_segmentize(blob: bytes, max_len: float) -> bytes:
    g = _wkb.decode(blob)
    if g["type"] == "Point":
        return blob
    if g["type"] == "LineString":
        return _wkb.encode_linestring(segmentize_coords(g["coordinates"],
                                                        max_len))
    if g["type"] == "Polygon":
        return _wkb.encode_polygon(
            [segmentize_coords(_close(r), max_len)
             for r in g["coordinates"]])
    raise ValueError(f"segmentize: unsupported {g['type']}")


def wkb_swap_xy(blob: bytes) -> bytes:
    """gdal vector swap-xy."""
    g = _wkb.decode(blob)
    if g["type"] == "Point":
        x, y = g["coordinates"]
        return _wkb.encode_point(y, x)
    if g["type"] == "LineString":
        return _wkb.encode_linestring(
            np.asarray(g["coordinates"])[:, ::-1])
    if g["type"] == "Polygon":
        return _wkb.encode_polygon(
            [np.asarray(r)[:, ::-1] for r in g["coordinates"]])
    if g["type"] == "MultiPolygon":
        return _wkb.encode_multipolygon(
            [[np.asarray(r)[:, ::-1] for r in rings]
             for rings in g["coordinates"]])
    raise ValueError(f"swap_xy: unsupported {g['type']}")


def point_buffer(x: float, y: float, dist: float,
                 quadsegs: int = 30) -> bytes:
    """Buffer of a point = regular polygon with 4*quadsegs segments
    (GEOS default quadrant-segment convention, OGRGeometry::Buffer
    ogr/ogrgeometry.cpp:4949)."""
    n = 4 * quadsegs
    th = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    ring = np.column_stack([x + dist * np.cos(th), y + dist * np.sin(th)])
    return _wkb.encode_polygon([ring])


def _segments_intersect(p1, p2, p3, p4) -> bool:
    """Proper intersection of open segments p1p2 / p3p4."""
    d1 = np.cross(p4 - p3, p1 - p3)
    d2 = np.cross(p4 - p3, p2 - p3)
    d3 = np.cross(p2 - p1, p3 - p1)
    d4 = np.cross(p2 - p1, p4 - p1)
    return bool(((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)))


def _ring_is_simple(ring: np.ndarray) -> bool:
    """O(n^2) proper-self-intersection check (unclosed vertex list)."""
    n = len(ring)
    segs = [(ring[i], ring[(i + 1) % n]) for i in range(n)]
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent via wraparound
            if _segments_intersect(*segs[i], *segs[j]):
                return False
    return True


def polygon_buffer_ring(ring: np.ndarray, dist: float,
                        quadsegs: int = 30) -> np.ndarray:
    """Positive offset of a simple polygon ring (the Minkowski-sum
    construction OGRGeometry::Buffer delegates to GEOS for,
    ogr/ogrgeometry.cpp:4949): each edge translates outward by
    ``dist`` along its normal; convex vertices get a circular fillet
    subdivided at the quadrant-segment step ((pi/2)/quadsegs, the GEOS
    convention); reflex vertices take the offset-line intersection
    (valid while ``dist`` is small against the local concavity — the
    result is checked simple and rejected otherwise, unlike GEOS's
    full arrangement).  Input: unclosed CCW vertex list; output:
    unclosed CCW vertex list."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    if ring_signed_area(np.vstack([r, r[:1]])) < 0:
        r = r[::-1].copy()
    e = np.roll(r, -1, axis=0) - r  # edge i: r[i] -> r[i+1]
    ln = np.hypot(e[:, 0], e[:, 1])
    if np.any(ln == 0.0):
        raise ValueError("buffer: repeated consecutive vertices")
    nx, ny = e[:, 1] / ln, -e[:, 0] / ln  # outward normal (CCW ring)
    step = (np.pi / 2.0) / quadsegs
    pts = []
    E = len(r)
    for i in range(E):
        p = (i - 1) % E
        cross = nx[p] * ny[i] - ny[p] * nx[i]
        dot = nx[p] * nx[i] + ny[p] * ny[i]
        # + 0.0: an exact pi turn (line-buffer end cap) can produce
        # cross = -0.0, and atan2(-0, -1) = -pi would take the reflex
        # branch instead of emitting the half-circle cap
        theta = np.arctan2(cross + 0.0, dot)
        if theta > 1e-12:
            # convex fillet: arc from normal[p] to normal[i]; emit
            # k=1..n (k=0 duplicates the previous edge's far offset)
            # -1e-6 guard: theta comes through atan2 of normalized
            # normals, which can land a few ulps off an exact multiple
            # of step on a different libm; a flipped count would move
            # the fillet area by ~6e-4 and break cross-host oracles.
            n = max(1, int(np.ceil(theta / step - 1e-6)))
            a0 = np.arctan2(ny[p], nx[p])
            ang = a0 + theta * np.arange(1, n + 1) / n
            pts.append(np.column_stack([r[i, 0] + dist * np.cos(ang),
                                        r[i, 1] + dist * np.sin(ang)]))
        else:
            # reflex (or straight): intersect the two offset lines
            a = r[i] + dist * np.array([nx[p], ny[p]])
            b = r[i] + dist * np.array([nx[i], ny[i]])
            den = e[p, 0] * e[i, 1] - e[p, 1] * e[i, 0]
            if abs(den) < 1e-12 * ln[p] * ln[i]:
                pts.append(b[None, :])  # collinear: offsets coincide
            else:
                t = ((b[0] - a[0]) * e[i, 1] - (b[1] - a[1]) * e[i, 0]) \
                    / den
                pts.append((a + t * e[p])[None, :])
        pts.append((r[(i + 1) % E] + dist * np.array([nx[i], ny[i]])
                    )[None, :])
    out = np.vstack(pts)
    # rotate so the ring starts at vertex 0's first fillet point (the
    # loop above starts mid-way through vertex 0's fan) — cosmetic;
    # area/validity are rotation-invariant
    if not _ring_is_simple(out):
        raise NotImplementedError(
            "buffer: offset ring self-intersects (distance too large "
            "for this concavity); a full GEOS-style arrangement is out "
            "of scope")
    return out


def line_buffer_ring(coords: np.ndarray, dist: float,
                     quadsegs: int = 30) -> np.ndarray:
    """Buffer of an open polyline (OGRGeometry::Buffer on a LineString,
    ogr/ogrgeometry.cpp:4949 — GEOS round caps + round joins): built as
    the positive offset of the DEGENERATE ring [p0..pm, pm-1..p1]
    (the path followed by its reverse — zero area, perimeter 2L).  Each
    endpoint then appears as a turn of exactly pi (atan2(+0,-1) — the
    round cap is the half-circle fillet), each interior vertex once
    convex (arc join) and once reflex (offset-line intersection), so
    ``polygon_buffer_ring`` produces the capsule union directly.  The
    simplicity fence rejects self-overlapping buffers (sharp turns with
    large ``dist``) exactly like the polygon case."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        raise ValueError("line buffer needs >= 2 points")
    if np.allclose(c[0], c[-1]):
        raise NotImplementedError(
            "buffer: closed linestrings (rings) are polygon boundaries; "
            "buffer the polygon instead")
    degenerate = np.vstack([c, c[-2:0:-1]])
    out = polygon_buffer_ring(degenerate, dist, quadsegs)
    # the degenerate ring has zero signed area, so the CCW
    # normalization inside polygon_buffer_ring is a no-op; normalize
    # the RESULT so callers always see a CCW exterior ring
    if ring_signed_area(np.vstack([out, out[:1]])) < 0:
        out = out[::-1].copy()
    return out


def polygon_erode_ring(ring: np.ndarray, dist: float) -> np.ndarray:
    """Negative buffer (erosion) of a CONVEX ring by ``dist`` > 0:
    every edge line shifts inward by ``dist`` and consecutive offset
    lines intersect into the new vertices — for a convex polygon the
    erosion is exactly the intersection of the inward-offset
    half-planes, no arcs (Minkowski difference with a disk).  Raises
    when an edge collapses (a straight-skeleton event: the result
    would lose edges, which needs the full skeleton — out of scope),
    when the result degenerates, or when the input is concave."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    if ring_signed_area(np.vstack([r, r[:1]])) < 0:
        r = r[::-1].copy()
    e = np.roll(r, -1, axis=0) - r
    ln = np.hypot(e[:, 0], e[:, 1])
    if np.any(ln == 0.0):
        raise ValueError("erode: repeated consecutive vertices")
    cross = e[:, 0] * np.roll(e[:, 1], -1) - e[:, 1] * np.roll(e[:, 0], -1)
    if np.any(cross <= 0.0):
        raise NotImplementedError(
            "erode: concave polygons need the straight skeleton; "
            "out of scope")
    nx, ny = e[:, 1] / ln, -e[:, 0] / ln  # outward normal (CCW)
    # inward-shifted anchor point per edge
    ax = r[:, 0] - dist * nx
    ay = r[:, 1] - dist * ny
    out = np.empty_like(r)
    E = len(r)
    for i in range(E):
        p = (i - 1) % E
        den = e[p, 0] * e[i, 1] - e[p, 1] * e[i, 0]
        t = ((ax[i] - ax[p]) * e[i, 1] - (ay[i] - ay[p]) * e[i, 0]) / den
        out[i, 0] = ax[p] + t * e[p, 0]
        out[i, 1] = ay[p] + t * e[p, 1]
    e2 = np.roll(out, -1, axis=0) - out
    if (np.any(np.einsum("ij,ij->i", e2, e) <= 0.0)
            or ring_signed_area(np.vstack([out, out[:1]])) <= 0.0):
        raise NotImplementedError(
            "erode: distance reaches a straight-skeleton event (an "
            "edge collapses); out of scope")
    return out


def wkb_buffer(blob: bytes, dist: float, quadsegs: int = 30) -> bytes:
    """Buffer point / line / polygon geometries
    (OGRGeometry::Buffer, ogr/ogrgeometry.cpp:4949).

    Points → regular 4*quadsegs-gon; LineStrings → capsule union
    (round caps/joins via the degenerate-ring construction, fenced at
    self-overlap); Polygons: positive distances dilate the outer ring
    and erode CONVEX holes inward (a hole whose erosion collapses is
    filled — matching GEOS, where the shrinking hole vanishes);
    negative distances erode CONVEX hole-free polygons exactly (inward
    half-plane intersection), fenced at straight-skeleton events."""
    g = _wkb.decode(blob)
    if g["type"] == "Point":
        return point_buffer(*g["coordinates"], dist, quadsegs)
    if g["type"] == "LineString":
        ring = line_buffer_ring(g["coordinates"], dist, quadsegs)
        return _wkb.encode_polygon([np.vstack([ring, ring[:1]])])
    if g["type"] == "Polygon":
        holes = g["coordinates"][1:]
        if dist == 0:
            return blob
        if dist < 0:
            if holes:
                raise NotImplementedError(
                    "buffer: negative distance on a polygon with holes "
                    "(holes would GROW and could merge — needs the "
                    "arrangement); out of scope")
            ring = polygon_erode_ring(g["coordinates"][0], -dist)
            return _wkb.encode_polygon([np.vstack([ring, ring[:1]])])
        outer = polygon_buffer_ring(g["coordinates"][0], dist, quadsegs)
        rings = [np.vstack([outer, outer[:1]])]
        for h in holes:
            try:
                shrunk = polygon_erode_ring(h, dist)
            except NotImplementedError as exc:
                if "skeleton event" in str(exc):
                    continue  # hole collapsed: it is filled
                raise
            # emit holes CW (OGC winding; area code is order-based)
            shrunk = shrunk[::-1]
            rings.append(np.vstack([shrunk, shrunk[:1]]))
        return _wkb.encode_polygon(rings)
    raise NotImplementedError(
        f"buffer: unsupported geometry {g['type']}")


def _coord_paths(g: dict) -> tuple[np.ndarray, list[np.ndarray]]:
    """(vertex array, boundary polylines) of a decoded Point /
    LineString / Polygon — the shapes the ST_ predicate tier covers
    (the reference's SQLite dialect delegates the full matrix to GEOS,
    doc/source/user/sql_sqlite_dialect.rst)."""
    t = g["type"]
    if t == "Point":
        return np.asarray([g["coordinates"]], np.float64), []
    if t == "LineString":
        arr = np.asarray(g["coordinates"], np.float64)
        return arr, [arr]
    if t == "Polygon":
        rings = [_close(np.asarray(r, np.float64))
                 for r in g["coordinates"]]
        return np.vstack([r[:-1] for r in rings]), rings
    raise ValueError(f"ST_ predicate: unsupported geometry {t}")


def _pts_to_paths_dist(P: np.ndarray, paths) -> float:
    """Min distance from points P (k,2) to polylines (vectorized
    point-segment clamp projection)."""
    best = np.inf
    for path in paths:
        A, B = path[:-1], path[1:]
        d = B - A
        L2 = np.einsum("ij,ij->i", d, d)
        L2 = np.where(L2 == 0.0, 1.0, L2)
        diff = P[:, None, :] - A[None, :, :]
        t = np.clip(np.einsum("kmj,mj->km", diff, d) / L2[None], 0.0, 1.0)
        dx = diff[..., 0] - t * d[None, :, 0]
        dy = diff[..., 1] - t * d[None, :, 1]
        best = min(best, float(np.hypot(dx, dy).min()))
    return best


def _paths_cross(paths_a, paths_b) -> bool:
    """Any PROPER segment crossing between two path sets (vectorized
    orientation tests; touching endpoints are handled by the zero
    point-to-path distance instead)."""
    for pa_ in paths_a:
        A1, A2 = pa_[:-1], pa_[1:]
        for pb in paths_b:
            B1, B2 = pb[:-1], pb[1:]
            ab = A2 - A1
            cd = (B2 - B1)[None, :, :]
            r1 = B1[None, :, :] - A1[:, None, :]
            r2 = B2[None, :, :] - A1[:, None, :]
            d1 = ab[:, None, 0] * r1[..., 1] - ab[:, None, 1] * r1[..., 0]
            d2 = ab[:, None, 0] * r2[..., 1] - ab[:, None, 1] * r2[..., 0]
            r3 = A1[:, None, :] - B1[None, :, :]
            r4 = A2[:, None, :] - B1[None, :, :]
            d3 = cd[..., 0] * r3[..., 1] - cd[..., 1] * r3[..., 0]
            d4 = cd[..., 0] * r4[..., 1] - cd[..., 1] * r4[..., 0]
            if np.any(((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))):
                return True
    return False


def wkb_distance(a_blob: bytes, b_blob: bytes) -> float:
    """ST_DISTANCE for Point/LineString/Polygon pairs: 0 when the
    geometries intersect (containment or boundary crossing), else the
    min boundary distance (attained at a vertex projection — exact for
    piecewise-linear geometries)."""
    from .predicates import PreparedPolygon

    ga, gb = _wkb.decode(a_blob), _wkb.decode(b_blob)
    pa_, paths_a = _coord_paths(ga)
    pb, paths_b = _coord_paths(gb)
    if ga["type"] == "Polygon" and PreparedPolygon.from_wkb(a_blob) \
            .covers(pb[:, 0], pb[:, 1]).any():
        return 0.0
    if gb["type"] == "Polygon" and PreparedPolygon.from_wkb(b_blob) \
            .covers(pa_[:, 0], pa_[:, 1]).any():
        return 0.0
    if paths_a and paths_b and _paths_cross(paths_a, paths_b):
        return 0.0
    cands = []
    if paths_b:
        cands.append(_pts_to_paths_dist(pa_, paths_b))
    if paths_a:
        cands.append(_pts_to_paths_dist(pb, paths_a))
    if not cands:
        diff = pa_[:, None, :] - pb[None, :, :]
        cands.append(float(np.hypot(diff[..., 0], diff[..., 1]).min()))
    return min(cands)


def wkb_intersects(a_blob: bytes, b_blob: bytes) -> bool:
    """ST_INTERSECTS = zero distance (covers containment, proper
    crossings, and exact touches)."""
    return wkb_distance(a_blob, b_blob) == 0.0


def wkb_contains(a_blob: bytes, b_blob: bytes) -> bool:
    """ST_CONTAINS for a Polygon container: every vertex of ``b``
    covered, at least one properly interior (OGC: boundary-only
    contact is not containment), no proper boundary crossing, and no
    hole of ``a`` poking into a polygonal ``b``.  Simple-geometry
    subset of the GEOS matrix; collections raise."""
    from .predicates import PreparedPolygon

    ga = _wkb.decode(a_blob)
    if ga["type"] != "Polygon":
        raise ValueError("ST_CONTAINS: container must be a Polygon")
    gb = _wkb.decode(b_blob)
    pb, paths_b = _coord_paths(gb)
    prep = PreparedPolygon.from_wkb(a_blob)
    if not prep.covers(pb[:, 0], pb[:, 1]).all():
        return False
    if not prep.contains_properly(pb[:, 0], pb[:, 1]).any():
        return False
    _, paths_a = _coord_paths(ga)
    if paths_b and _paths_cross(paths_a, paths_b):
        return False
    if gb["type"] == "Polygon" and len(ga["coordinates"]) > 1:
        inner = PreparedPolygon.from_wkb(b_blob)
        for hole in ga["coordinates"][1:]:
            h = np.asarray(hole, np.float64)
            if inner.contains_properly(h[:, 0], h[:, 1]).any():
                return False
    return True


def explode_parts(blob: bytes) -> list[bytes]:
    """explode-collections: one WKB per part; single geoms pass through
    (apps/gdalalg_vector_explode_collections.cpp)."""
    g = _wkb.decode(blob)
    if g["type"] == "MultiPolygon":
        return [_wkb.encode_polygon(rings) for rings in g["coordinates"]]
    if g["type"] == "MultiPoint":
        return [_wkb.encode_point(*c) for c in g["coordinates"]]
    if g["type"] == "MultiLineString":
        return [_wkb.encode_linestring(c) for c in g["coordinates"]]
    return [blob]


def wkb_is_valid(blob: bytes) -> bool:
    """check-geometry lite: rings closed, >=4 points, finite coords,
    nonzero area (not full OGC validity — self-intersection detection
    is O(n^2) and done only in tests)."""
    try:
        g = _wkb.decode(blob)
    except Exception:
        return False
    if g["type"] == "Point":
        return bool(np.all(np.isfinite(g["coordinates"])))
    if g["type"] in ("Polygon", "MultiPolygon"):
        for rings in polygon_rings(g):
            for ring in rings:
                r = _close(ring)
                if len(r) < 4 or not np.all(np.isfinite(r)):
                    return False
                if ring_signed_area(r) == 0.0:
                    return False
        return True
    if g["type"] == "LineString":
        arr = np.asarray(g["coordinates"])
        return len(arr) >= 2 and bool(np.all(np.isfinite(arr)))
    return True


def make_valid_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Structural validity repair (the STRUCTURE subset of
    OGRGeometry::MakeValid, ogr/ogrgeometry.cpp:4183): drop repeated
    consecutive vertices, close rings, drop degenerate (<3 distinct
    vertex) rings, and orient outer ring CCW / holes CW (OGC winding).
    Self-intersection repair (the GEOS linework pass) is out of scope —
    inputs with crossing edges pass through unchanged."""
    out = []
    for i, ring in enumerate(rings):
        r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if len(r) >= 2 and np.allclose(r[0], r[-1]):
            r = r[:-1]
        keep = np.r_[True, np.any(np.abs(np.diff(r, axis=0)) > 1e-12,
                                  axis=1)]
        r = r[keep]
        if len(r) < 3:
            continue
        area = ring_signed_area(np.vstack([r, r[:1]]))
        want_ccw = i == 0
        if (area < 0) == want_ccw:
            r = r[::-1]
        out.append(np.vstack([r, r[:1]]))
    return out


def wkb_make_valid(blob: bytes) -> bytes | None:
    """MakeValid (structural subset) over Polygon/MultiPolygon WKB;
    None when nothing valid remains."""
    from . import wkb as _wkb

    g = _wkb.decode(blob)
    if g["type"] == "Polygon":
        rings = make_valid_rings(g["coordinates"])
        return _wkb.encode_polygon(rings) if rings else None
    if g["type"] == "MultiPolygon":
        polys = [make_valid_rings(p) for p in g["coordinates"]]
        polys = [p for p in polys if p]
        return _wkb.encode_multipolygon(polys) if polys else None
    return blob  # points / lines pass through


def concave_hull_points(pts: np.ndarray, alpha: float) -> np.ndarray:
    """Alpha-shape concave hull (Edelsbrunner): keep Delaunay triangles
    with circumradius <= alpha, take the boundary edges (those used by
    exactly one kept triangle) and chain them into a ring.  The
    reference's ConcaveHull (ogrgeometry.cpp:4569) is GEOS's
    ratio-parameterized variant — same purpose, different parameter;
    alpha → ∞ degenerates to the convex hull."""
    from .delaunay import delaunay

    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    tris = delaunay(pts)
    if not len(tris):
        return convex_hull_points(pts)
    t = pts[tris]
    a = np.linalg.norm(t[:, 0] - t[:, 1], axis=1)
    b = np.linalg.norm(t[:, 1] - t[:, 2], axis=1)
    c = np.linalg.norm(t[:, 2] - t[:, 0], axis=1)
    s = (a + b + c) / 2.0
    with np.errstate(invalid="ignore", divide="ignore"):
        area = np.sqrt(np.maximum(s * (s - a) * (s - b) * (s - c), 0.0))
        circum_r = np.where(area > 0, a * b * c / (4.0 * area), np.inf)
    kept = tris[circum_r <= alpha]
    if not len(kept):
        return convex_hull_points(pts)
    edge_count: dict = {}
    for t3 in kept:
        for e in ((t3[0], t3[1]), (t3[1], t3[2]), (t3[2], t3[0])):
            k = (min(e), max(e))
            edge_count[k] = edge_count.get(k, 0) + 1
    boundary = [e for e, n in edge_count.items() if n == 1]
    if not boundary:
        return convex_hull_points(pts)
    # chain the boundary edges into a ring (largest loop wins)
    adj: dict = {}
    for u, v in boundary:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    best: list[int] = []
    visited = set()
    for start in adj:
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        cur, prev = start, -1
        while True:
            nxts = [n for n in adj[cur] if n != prev]
            if not nxts:
                break
            prev, cur = cur, nxts[0]
            if cur == start:
                break
            if cur in visited:
                break
            visited.add(cur)
            loop.append(cur)
        if len(loop) > len(best):
            best = loop
    return pts[np.asarray(best, dtype=np.int64)]


def wkb_concave_hull(blob: bytes, alpha: float) -> bytes:
    from . import wkb as _wkb

    g = _wkb.decode(blob)
    if g["type"] == "Point":
        pts = np.asarray(g["coordinates"], dtype=np.float64).reshape(1, 2)
    elif g["type"] == "LineString":
        pts = np.asarray(g["coordinates"], dtype=np.float64)
    elif g["type"] == "Polygon":
        pts = np.vstack([np.asarray(r, dtype=np.float64)
                         for r in g["coordinates"]])
    else:
        pts = np.vstack([np.asarray(r, dtype=np.float64)
                         for poly in g["coordinates"] for r in poly])
    hull = concave_hull_points(pts, alpha)
    if len(hull) < 3:
        return _wkb.encode_polygon([np.vstack([hull, hull[:1]])]) \
            if len(hull) else blob
    return _wkb.encode_polygon([np.vstack([hull, hull[:1]])])
