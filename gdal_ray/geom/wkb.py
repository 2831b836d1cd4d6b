"""Vectorized WKB (ISO well-known binary) codec over numpy / Arrow.

Geometry crosses stage boundaries only as WKB bytes in Arrow ``binary``
columns — the exact convention GDAL's Arrow bridge defines
(ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:2725-2727: geometry columns are
Arrow ``binary`` with field metadata ``ARROW:extension:name=ogc.wkb``).

The hot path is 2-D points: ``encode_points`` / ``decode_points`` work on
whole columns at once with zero Python per-row work.  Polygons /
multipolygons appear only on the broadcast (small) side of spatial joins,
so their codec is scalar-per-geometry but numpy-per-ring.

Type codes per ISO SQL/MM (ogr/ogr_core.h:422-470 ``wkbGeometryType``).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7
# ISO SQL/MM curve types (ogr/ogr_core.h:440-446)
WKB_CIRCULARSTRING = 8
WKB_COMPOUNDCURVE = 9
WKB_CURVEPOLYGON = 10
WKB_MULTICURVE = 11
WKB_MULTISURFACE = 12

GEOMETRY_FIELD_METADATA = {b"ARROW:extension:name": b"ogc.wkb"}

# Packed little-endian 2-D point WKB: 1 byte order + 4 type + 8 x + 8 y = 21 bytes
_POINT_DTYPE = np.dtype(
    {
        "names": ["order", "gtype", "x", "y"],
        "formats": ["u1", "<u4", "<f8", "<f8"],
        "offsets": [0, 1, 5, 13],
        "itemsize": 21,
    }
)


def encode_points(x: np.ndarray, y: np.ndarray) -> pa.BinaryArray:
    """Encode parallel x/y float64 arrays into an Arrow binary column of
    WKB 2-D points.  Fully vectorized; output is built straight from
    buffers (no per-row Python)."""
    n = len(x)
    rec = np.empty(n, dtype=_POINT_DTYPE)
    rec["order"] = 1  # little endian
    rec["gtype"] = WKB_POINT
    rec["x"] = x
    rec["y"] = y
    values = pa.py_buffer(rec.tobytes())
    offsets = pa.py_buffer(np.arange(0, 21 * (n + 1), 21, dtype=np.int32).tobytes())
    return pa.BinaryArray.from_buffers(pa.binary(), n, [None, offsets, values])


def decode_points(col) -> tuple[np.ndarray, np.ndarray]:
    """Decode an Arrow binary column (or list of bytes) of uniform 2-D WKB
    points into (x, y) float64 arrays.

    Fast path: all rows are 21-byte little-endian points → a single
    buffer reinterpret.  Falls back to the generic decoder otherwise.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.BinaryArray):
        buf = np.frombuffer(
            col.buffers()[2], dtype=np.uint8, count=col.buffers()[2].size
        )
        all_offs = np.frombuffer(col.buffers()[1], dtype=np.int32)
        offs = all_offs[col.offset : col.offset + len(col) + 1]
        lens = np.diff(offs)
        if len(col) and np.all(lens == 21):
            start = offs[0]
            rec = buf[start : start + 21 * len(col)].view(_POINT_DTYPE)
            if np.all(rec["order"] == 1) and np.all(rec["gtype"] == WKB_POINT):
                return rec["x"].astype(np.float64), rec["y"].astype(np.float64)
        blobs = [col[i].as_py() for i in range(len(col))]
    else:
        blobs = list(col)
    xs = np.empty(len(blobs))
    ys = np.empty(len(blobs))
    for i, b in enumerate(blobs):
        g = decode(b)
        if g["type"] != "Point":
            raise ValueError(f"expected Point, got {g['type']}")
        xs[i], ys[i] = g["coordinates"]
    return xs, ys


# ---------------------------------------------------------------------------
# Generic scalar codec (GeoJSON-style dicts; rings are numpy (n,2) arrays)
# ---------------------------------------------------------------------------


def _rd(buf: memoryview, off: int, fmt: str) -> tuple:
    return struct.unpack_from(fmt, buf, off)


def decode(wkb: bytes) -> dict:
    """Decode one WKB blob into {'type': ..., 'coordinates': ...}.

    Points → (x, y); LineString → (n,2) ndarray; Polygon → list of
    (n,2) ring ndarrays; Multi*/GeometryCollection → list of parts.
    """
    g, _ = _decode_at(memoryview(wkb), 0)
    return g


def _decode_at(buf: memoryview, off: int) -> tuple[dict, int]:
    (order,) = _rd(buf, off, "B")
    e = "<" if order == 1 else ">"
    (gtype,) = _rd(buf, off + 1, e + "I")
    off += 5
    base = gtype % 1000  # strip Z/M/ZM variants (1000/2000/3000 offsets)
    ndim = 2 + (1 if gtype >= 1000 else 0) + (1 if gtype >= 3000 else 0)
    if base == WKB_POINT:
        coords = struct.unpack_from(e + "d" * ndim, buf, off)
        return {"type": "Point", "coordinates": coords[:2]}, off + 8 * ndim
    if base == WKB_LINESTRING:
        (n,) = _rd(buf, off, e + "I")
        off += 4
        arr = np.frombuffer(buf, dtype=e + "f8", count=n * ndim, offset=off)
        arr = arr.reshape(n, ndim)[:, :2].copy()
        return {"type": "LineString", "coordinates": arr}, off + 8 * ndim * n
    if base == WKB_POLYGON:
        (nrings,) = _rd(buf, off, e + "I")
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = _rd(buf, off, e + "I")
            off += 4
            arr = np.frombuffer(buf, dtype=e + "f8", count=n * ndim, offset=off)
            rings.append(arr.reshape(n, ndim)[:, :2].copy())
            off += 8 * ndim * n
        return {"type": "Polygon", "coordinates": rings}, off
    if base == WKB_CIRCULARSTRING:
        # same layout as LineString; n odd ≥ 3, each consecutive
        # (start, via, end) triple defines one circular arc
        (n,) = _rd(buf, off, e + "I")
        off += 4
        arr = np.frombuffer(buf, dtype=e + "f8", count=n * ndim, offset=off)
        arr = arr.reshape(n, ndim)[:, :2].copy()
        return {"type": "CircularString", "coordinates": arr}, off + 8 * ndim * n
    if base == WKB_CURVEPOLYGON:
        # rings are full geometries: LineString / CircularString /
        # CompoundCurve (ogr/ogr_geometry.h:2461 OGRCurvePolygon)
        (nrings,) = _rd(buf, off, e + "I")
        off += 4
        rings = []
        for _ in range(nrings):
            g, off = _decode_at(buf, off)
            rings.append(g)
        return {"type": "CurvePolygon",
                "coordinates": [r["coordinates"] for r in rings],
                "parts": rings}, off
    if base in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                WKB_GEOMETRYCOLLECTION, WKB_COMPOUNDCURVE, WKB_MULTICURVE,
                WKB_MULTISURFACE):
        name = {
            WKB_MULTIPOINT: "MultiPoint",
            WKB_MULTILINESTRING: "MultiLineString",
            WKB_MULTIPOLYGON: "MultiPolygon",
            WKB_GEOMETRYCOLLECTION: "GeometryCollection",
            WKB_COMPOUNDCURVE: "CompoundCurve",
            WKB_MULTICURVE: "MultiCurve",
            WKB_MULTISURFACE: "MultiSurface",
        }[base]
        (nparts,) = _rd(buf, off, e + "I")
        off += 4
        parts = []
        for _ in range(nparts):
            g, off = _decode_at(buf, off)
            parts.append(g)
        return {"type": name, "coordinates": [p["coordinates"] for p in parts],
                "parts": parts}, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def encode_linestring(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8").reshape(-1, 2)
    return struct.pack("<BII", 1, WKB_LINESTRING, len(arr)) + arr.tobytes()


def encode_polygon(rings) -> bytes:
    """rings: sequence of (n,2) coordinate sequences; first = exterior.
    Rings are closed automatically if not already closed."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype="<f8").reshape(-1, 2)
        if len(arr) and not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        out.append(struct.pack("<I", len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def encode_linestring_z(coords) -> bytes:
    """Z-typed (1000-offset) LineString from (n,3) coordinates."""
    arr = np.asarray(coords, dtype="<f8").reshape(-1, 3)
    return struct.pack("<BII", 1, WKB_LINESTRING + 1000, len(arr)) \
        + arr.tobytes()


def encode_polygon_z(rings) -> bytes:
    """Z-typed Polygon from (n,3) rings (closed automatically)."""
    out = [struct.pack("<BII", 1, WKB_POLYGON + 1000, len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype="<f8").reshape(-1, 3)
        if len(arr) and not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        out.append(struct.pack("<I", len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def first_z(wkb: bytes) -> float | None:
    """Z of the FIRST vertex of a Z-typed geometry, or None for 2-D —
    the BURN_VALUE_FROM=Z rule reads exactly this for polygon fills
    (alg/gdalrasterize.cpp:745-760: 'the polygon is filled using the
    variant from the first point of the first segment')."""
    buf = memoryview(wkb)
    (order,) = _rd(buf, 0, "B")
    e = "<" if order == 1 else ">"
    (gtype,) = _rd(buf, 1, e + "I")
    base = gtype % 1000
    has_z = gtype >= 1000 and gtype < 3000 or gtype >= 3000
    if not has_z:
        return None
    off = 5
    if base == WKB_POINT:
        return _rd(buf, off + 16, e + "d")[0]
    if base in (WKB_LINESTRING, WKB_CIRCULARSTRING):
        return _rd(buf, off + 4 + 16, e + "d")[0]
    if base == WKB_POLYGON:
        return _rd(buf, off + 4 + 4 + 16, e + "d")[0]
    if base in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                WKB_GEOMETRYCOLLECTION):
        (nparts,) = _rd(buf, off, e + "I")
        if nparts == 0:
            return None
        return first_z(bytes(buf[off + 4:]))
    return None


def encode_multipolygon(polys) -> bytes:
    """polys: sequence of ring-lists."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def encode_circularstring(coords) -> bytes:
    """coords: (n,2), n odd ≥ 3 — consecutive (start, via, end) arc
    triples sharing endpoints (OGRCircularString, ogr/ogr_geometry.h:1949)."""
    arr = np.asarray(coords, dtype="<f8").reshape(-1, 2)
    if len(arr) < 3 or len(arr) % 2 == 0:
        raise ValueError("CircularString needs an odd point count >= 3")
    return struct.pack("<BII", 1, WKB_CIRCULARSTRING, len(arr)) + arr.tobytes()


def encode_compoundcurve(segments: list[bytes]) -> bytes:
    """segments: WKB LineString / CircularString blobs, contiguous
    (each starts where the previous ends)."""
    return (struct.pack("<BII", 1, WKB_COMPOUNDCURVE, len(segments))
            + b"".join(segments))


def encode_curvepolygon(rings: list[bytes]) -> bytes:
    """rings: WKB LineString / CircularString / CompoundCurve blobs,
    each closed; first = exterior."""
    return (struct.pack("<BII", 1, WKB_CURVEPOLYGON, len(rings))
            + b"".join(rings))


def encode_multicurve(curves: list[bytes]) -> bytes:
    return (struct.pack("<BII", 1, WKB_MULTICURVE, len(curves))
            + b"".join(curves))


def encode_multisurface(surfaces: list[bytes]) -> bytes:
    return (struct.pack("<BII", 1, WKB_MULTISURFACE, len(surfaces))
            + b"".join(surfaces))


def box_polygon(minx: float, miny: float, maxx: float, maxy: float) -> bytes:
    """Axis-aligned box as a WKB polygon (CCW exterior)."""
    return encode_polygon(
        [[(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]]
    )


# --- minimal WKT support (test fixtures quote reference WKTs verbatim) ----


def wkt_to_wkb(wkt: str) -> bytes:
    """Parse the small WKT subset used by the reference's layer-algebra
    fixtures (autotest/ogr/ogr_layer_algebra.py:55-100): POINT, LINESTRING,
    POLYGON, MULTIPOLYGON."""
    s = wkt.strip()
    head, _, body = s.partition("(")
    typ = head.strip().upper()
    body = "(" + body

    def parse_ring(txt: str) -> np.ndarray:
        pts = [tuple(float(v) for v in p.split()) for p in txt.split(",")]
        return np.asarray(pts, dtype=np.float64)

    def split_parens(txt: str) -> list[str]:
        # split "( ... ),( ... )" at depth 0 into inner texts
        parts, depth, start = [], 0, None
        for i, c in enumerate(txt):
            if c == "(":
                if depth == 0:
                    start = i + 1
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    parts.append(txt[start:i])
        return parts

    def split_items(txt: str) -> list[str]:
        # split top-level comma-separated items (respecting parens):
        # "CIRCULARSTRING(...),( ... ),COMPOUNDCURVE(...)" → 3 items
        parts, depth, cur = [], 0, []
        for c in txt:
            if c == "(":
                depth += 1
                cur.append(c)
            elif c == ")":
                depth -= 1
                cur.append(c)
            elif c == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(c)
        if cur:
            parts.append("".join(cur).strip())
        return [p for p in parts if p]

    def parse_curve_item(item: str) -> bytes:
        # a CompoundCurve/CurvePolygon/MultiCurve member: a typed
        # curve WKT, or a bare "(...)" point list ≡ LINESTRING
        if item.startswith("("):
            return encode_linestring(parse_ring(item.strip("() ")))
        return wkt_to_wkb(item)

    if typ == "POINT":
        x, y = (float(v) for v in body.strip("() ").split()[:2])
        return encode_point(x, y)
    if typ == "CIRCULARSTRING":
        return encode_circularstring(parse_ring(body.strip("() ")))
    if typ == "COMPOUNDCURVE":
        return encode_compoundcurve(
            [parse_curve_item(i) for i in split_items(body.strip()[1:-1])])
    if typ == "CURVEPOLYGON":
        return encode_curvepolygon(
            [parse_curve_item(i) for i in split_items(body.strip()[1:-1])])
    if typ == "MULTICURVE":
        return encode_multicurve(
            [parse_curve_item(i) for i in split_items(body.strip()[1:-1])])
    if typ == "MULTISURFACE":
        items = split_items(body.strip()[1:-1])
        surfs = []
        for it in items:
            if it.startswith("("):  # bare polygon ((ring),(ring))
                surfs.append(encode_polygon(
                    [parse_ring(r) for r in split_parens(it[1:-1])]))
            else:
                surfs.append(wkt_to_wkb(it))
        return encode_multisurface(surfs)
    if typ == "LINESTRING":
        return encode_linestring(parse_ring(body.strip("() ")))
    if typ == "POLYGON":
        rings = [parse_ring(r) for r in split_parens(body[1:-1])]
        return encode_polygon(rings)
    if typ == "MULTIPOLYGON":
        inner = body.strip()[1:-1]
        polys = []
        # each top-level group is a polygon: ((ring),(ring))
        depth, start = 0, None
        groups = []
        for i, c in enumerate(inner):
            if c == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    groups.append(inner[start : i + 1])
        for grp in groups:
            polys.append([parse_ring(r) for r in split_parens(grp[1:-1])])
        return encode_multipolygon(polys)
    raise ValueError(f"unsupported WKT type {typ}")


def wkb_to_wkt(wkb: bytes, precision: int = 15) -> str:
    """Format WKB back to WKT (tests compare against reference WKTs)."""
    g = decode(wkb)

    def fmt(v: float) -> str:
        s = f"{v:.{precision}g}"
        return s

    def ring_txt(arr) -> str:
        return ",".join(f"{fmt(p[0])} {fmt(p[1])}" for p in np.asarray(arr))

    t = g["type"]
    if t == "Point":
        x, y = g["coordinates"]
        return f"POINT ({fmt(x)} {fmt(y)})"
    if t == "LineString":
        return f"LINESTRING ({ring_txt(g['coordinates'])})"
    if t == "Polygon":
        return "POLYGON (" + ",".join(f"({ring_txt(r)})" for r in g["coordinates"]) + ")"
    if t == "MultiPolygon":
        polys = g["coordinates"]
        return "MULTIPOLYGON (" + ",".join(
            "(" + ",".join(f"({ring_txt(r)})" for r in rings) + ")" for rings in polys
        ) + ")"
    if t == "CircularString":
        return f"CIRCULARSTRING ({ring_txt(g['coordinates'])})"

    def curve_part_txt(p: dict) -> str:
        # inside COMPOUNDCURVE/CURVEPOLYGON, LineString members print
        # as bare point lists (ISO WKT convention)
        if p["type"] == "LineString":
            return f"({ring_txt(p['coordinates'])})"
        return _wkt_of_part(p, precision)

    if t == "CompoundCurve":
        return "COMPOUNDCURVE (" + ",".join(
            curve_part_txt(p) for p in g["parts"]) + ")"
    if t == "CurvePolygon":
        return "CURVEPOLYGON (" + ",".join(
            curve_part_txt(p) for p in g["parts"]) + ")"
    if t == "MultiCurve":
        return "MULTICURVE (" + ",".join(
            curve_part_txt(p) for p in g["parts"]) + ")"
    if t == "MultiSurface":
        return "MULTISURFACE (" + ",".join(
            _wkt_of_part(p, precision) for p in g["parts"]) + ")"
    raise ValueError(f"unsupported type {t}")


def _wkt_of_part(p: dict, precision: int) -> str:
    """WKT of a nested decoded part (re-encode then format)."""
    t = p["type"]
    if t == "CircularString":
        return wkb_to_wkt(encode_circularstring(p["coordinates"]),
                          precision)
    if t == "LineString":
        return wkb_to_wkt(encode_linestring(p["coordinates"]), precision)
    if t == "CompoundCurve":
        return wkb_to_wkt(
            encode_compoundcurve(
                [_part_wkb(q) for q in p["parts"]]), precision)
    if t == "CurvePolygon":
        return wkb_to_wkt(
            encode_curvepolygon(
                [_part_wkb(q) for q in p["parts"]]), precision)
    if t == "Polygon":
        return wkb_to_wkt(encode_polygon(p["coordinates"]), precision)
    raise ValueError(f"unsupported nested type {t}")


def _part_wkb(p: dict) -> bytes:
    t = p["type"]
    if t == "CircularString":
        return encode_circularstring(p["coordinates"])
    if t == "LineString":
        return encode_linestring(p["coordinates"])
    if t == "Polygon":
        return encode_polygon(p["coordinates"])
    raise ValueError(f"unsupported part type {t}")
