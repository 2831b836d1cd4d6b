"""Curve-geometry linearization (arc stroking).

The reference represents CircularString / CompoundCurve / CurvePolygon
/ MultiCurve / MultiSurface as first-class geometries and converts them
to linear types on demand via ``OGRGeometry::getLinearGeometry``
(ogr/ogrgeometry.cpp), stroking each circular arc with a maximum
angular step of ``OGR_ARC_STEPSIZE`` degrees (default 4°,
ogr/ogrgeometryfactory.cpp ``curveToLineString``).  This module
re-derives that from the published semantics:

- each consecutive (start, via, end) point triple of a CircularString
  defines one arc of the circumscribed circle, traversed from start to
  end PASSING THROUGH via;
- the arc is sampled at ``n = ceil(sweep / max_step)`` uniform angular
  steps (endpoints exact, so chords have length ``2·r·sin(sweep/2n)``);
- collinear triples degenerate to straight segments;
- CompoundCurve concatenates stroked segments; CurvePolygon strokes
  each ring; Multi* recurse.

All math is vectorized numpy per arc; geometries stay WKB bytes at
stage boundaries (engine invariant).
"""

from __future__ import annotations

import numpy as np

from . import wkb as _wkb

# default maximum angular step, degrees (OGR_ARC_STEPSIZE)
ARC_STEP_DEG = 4.0
# ceil() guard: a sweep recovered through atan2 can sit ±1 ulp around
# an exact multiple of the step; without the epsilon ceil() would add
# a phantom step (the reference guards the same way)
_CEIL_EPS = 1e-9


def stroke_arc(p0, p1, p2, max_step_deg: float = ARC_STEP_DEG) -> np.ndarray:
    """Sample the circular arc from p0 through p1 to p2 at uniform
    angular steps ≤ max_step_deg.  Returns (n+1, 2) points including
    both endpoints (exact copies of p0/p2).  Collinear triples return
    the 3-point polyline."""
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    x2, y2 = float(p2[0]), float(p2[1])
    d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    span = max(abs(x0) + abs(x1) + abs(x2), abs(y0) + abs(y1) + abs(y2), 1.0)
    if abs(d) < 1e-12 * span * span:
        return np.array([[x0, y0], [x1, y1], [x2, y2]], dtype=np.float64)
    s0 = x0 * x0 + y0 * y0
    s1 = x1 * x1 + y1 * y1
    s2 = x2 * x2 + y2 * y2
    cx = (s0 * (y1 - y2) + s1 * (y2 - y0) + s2 * (y0 - y1)) / d
    cy = (s0 * (x2 - x1) + s1 * (x0 - x2) + s2 * (x1 - x0)) / d
    a0 = np.arctan2(y0 - cy, x0 - cx)
    a1 = np.arctan2(y1 - cy, x1 - cx)
    a2 = np.arctan2(y2 - cy, x2 - cx)
    two_pi = 2.0 * np.pi
    d01 = (a1 - a0) % two_pi
    d02 = (a2 - a0) % two_pi
    # traverse a0→a2 through a1: CCW if a1 comes before a2 going CCW
    sweep = d02 if d01 <= d02 else d02 - two_pi
    step = np.radians(max_step_deg)
    n = max(1, int(np.ceil(abs(sweep) / step - _CEIL_EPS)))
    ang = a0 + sweep * (np.arange(1, n) / n)
    r0 = np.hypot(x0 - cx, y0 - cy)
    pts = np.empty((n + 1, 2), dtype=np.float64)
    pts[0] = (x0, y0)
    pts[1:n, 0] = cx + r0 * np.cos(ang)
    pts[1:n, 1] = cy + r0 * np.sin(ang)
    pts[n] = (x2, y2)
    return pts


def stroke_circularstring(coords, max_step_deg: float = ARC_STEP_DEG
                          ) -> np.ndarray:
    """CircularString (n odd ≥ 3) → stroked polyline, arcs chained on
    shared endpoints."""
    arr = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    out = [arr[:1]]
    for i in range(0, len(arr) - 2, 2):
        seg = stroke_arc(arr[i], arr[i + 1], arr[i + 2], max_step_deg)
        out.append(seg[1:])
    return np.vstack(out)


def linearize(geom: dict, max_step_deg: float = ARC_STEP_DEG) -> dict:
    """Curve geometry dict (from wkb.decode) → linear geometry dict
    (getLinearGeometry semantics).  Linear types pass through."""
    t = geom["type"]
    if t == "CircularString":
        return {"type": "LineString",
                "coordinates": stroke_circularstring(
                    geom["coordinates"], max_step_deg)}
    if t == "CompoundCurve":
        segs = [linearize(p, max_step_deg)["coordinates"]
                for p in geom["parts"]]
        pts = [segs[0]]
        for s in segs[1:]:
            pts.append(s[1:])  # segments share endpoints
        return {"type": "LineString", "coordinates": np.vstack(pts)}
    if t == "CurvePolygon":
        rings = [linearize(p, max_step_deg)["coordinates"]
                 for p in geom["parts"]]
        return {"type": "Polygon", "coordinates": rings}
    if t in ("MultiCurve", "MultiSurface", "GeometryCollection"):
        parts = [linearize(p, max_step_deg) for p in geom["parts"]]
        name = {"MultiCurve": "MultiLineString",
                "MultiSurface": "MultiPolygon",
                "GeometryCollection": "GeometryCollection"}[t]
        if name == "GeometryCollection":
            return {"type": name,
                    "coordinates": [p["coordinates"] for p in parts],
                    "parts": parts}
        return {"type": name,
                "coordinates": [p["coordinates"] for p in parts]}
    return geom


def linearize_wkb(blob: bytes, max_step_deg: float = ARC_STEP_DEG) -> bytes:
    """WKB (possibly curved) → WKB with curves stroked to linear types."""
    g = linearize(_wkb.decode(bytes(blob)), max_step_deg)
    t = g["type"]
    if t == "Point":
        return _wkb.encode_point(*g["coordinates"])
    if t == "LineString":
        return _wkb.encode_linestring(g["coordinates"])
    if t == "Polygon":
        return _wkb.encode_polygon(g["coordinates"])
    if t == "MultiLineString":
        import struct as _s
        parts = [_wkb.encode_linestring(c) for c in g["coordinates"]]
        return (_s.pack("<BII", 1, _wkb.WKB_MULTILINESTRING, len(parts))
                + b"".join(parts))
    if t == "MultiPolygon":
        return _wkb.encode_multipolygon(g["coordinates"])
    raise ValueError(f"cannot re-encode linearized type {t}")
