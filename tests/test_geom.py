"""Unit tests for the pure-numpy geometry kernels (no Ray).

Oracles follow the reference's test strategy (SURVEY.md §5): exact
golden values hand-derived from the published formulas the reference
itself implements (GlobalMercator math gdal2tiles.py:316-504; layer
algebra WKTs autotest/ogr/ogr_layer_algebra.py; Karney 2011 TM series).
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import cells, crs, predicates, strtree, tiles, wkb


# --- WKB -------------------------------------------------------------------


def test_point_roundtrip_vectorized():
    x = np.array([0.0, -179.99, 13.5, 2.0**-40])
    y = np.array([0.0, 85.0, -45.25, -2.0**-40])
    col = wkb.encode_points(x, y)
    assert isinstance(col, pa.BinaryArray)
    x2, y2 = wkb.decode_points(col)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)


def test_point_scalar_matches_vector():
    blob = wkb.encode_point(3.25, -7.5)
    col = wkb.encode_points(np.array([3.25]), np.array([-7.5]))
    assert col[0].as_py() == blob


def test_decode_points_sliced_column():
    col = wkb.encode_points(np.arange(5.0), np.arange(5.0) * 2)
    x2, y2 = wkb.decode_points(col.slice(2, 2))
    np.testing.assert_array_equal(x2, [2.0, 3.0])
    np.testing.assert_array_equal(y2, [4.0, 6.0])


def test_polygon_roundtrip_and_autoclose():
    rings = [[(0, 0), (10, 0), (10, 10), (0, 10)]]  # not closed
    g = wkb.decode(wkb.encode_polygon(rings))
    assert g["type"] == "Polygon"
    ring = g["coordinates"][0]
    assert len(ring) == 5
    np.testing.assert_array_equal(ring[0], ring[-1])


def test_wkt_reference_fixture_roundtrip():
    # WKTs from the reference's layer-algebra fixture
    # (autotest/ogr/ogr_layer_algebra.py:178-180)
    w = "POLYGON ((2 3,3 3,3 2,2 2,2 3))"
    assert wkb.wkb_to_wkt(wkb.wkt_to_wkb(w)) == w
    w2 = "POINT (1 2)"
    assert wkb.wkb_to_wkt(wkb.wkt_to_wkb(w2)) == w2
    w3 = "MULTIPOLYGON (((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))"
    assert wkb.wkb_to_wkt(wkb.wkt_to_wkb(w3)) == w3


def test_decode_z_variant_strips_to_2d():
    import struct

    # wkbPoint Z (ISO 1001): x, y, z
    blob = struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 3.0)
    g = wkb.decode(blob)
    assert g["type"] == "Point" and tuple(g["coordinates"]) == (1.0, 2.0)


# --- tile math -------------------------------------------------------------


def test_globalmercator_constants():
    # gdal2tiles.py:420,498: originShift and initial resolution
    assert tiles.ORIGIN_SHIFT == pytest.approx(20037508.342789244, abs=1e-6)
    assert tiles.INITIAL_RESOLUTION == pytest.approx(156543.03392804097)


def test_lonlat_to_meters_golden():
    mx, my = tiles.lonlat_to_meters(180.0, 0.0)
    assert mx == pytest.approx(tiles.ORIGIN_SHIFT)
    assert my == pytest.approx(0.0, abs=1e-9)
    # web mercator square: top edge at MAX_LATITUDE
    _, my2 = tiles.lonlat_to_meters(0.0, tiles.MAX_LATITUDE)
    assert my2 == pytest.approx(tiles.ORIGIN_SHIFT, rel=1e-12)


def test_meters_roundtrip():
    lon = np.linspace(-179, 179, 37)
    lat = np.linspace(-84, 84, 37)
    lon2, lat2 = tiles.meters_to_lonlat(*tiles.lonlat_to_meters(lon, lat))
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_slippy_tile_golden():
    # well-known slippy-map fixture: Greenwich at z=0..2 and a city point
    tx, ty = tiles.lonlat_to_tile(0.0, 0.0, 0)
    assert (tx, ty) == (0, 0)
    tx, ty = tiles.lonlat_to_tile(0.0, 0.0, 1)
    assert (tx, ty) == (1, 1)  # slight-east/south of center
    # Berlin (13.4, 52.52) at z=10 → x=550, y=335 (standard OSM result)
    tx, ty = tiles.lonlat_to_tile(13.4, 52.52, 10)
    assert (int(tx), int(ty)) == (550, 335)


def test_xyz_tms_flip_involution():
    z = 7
    ty = np.arange(2**z)
    flipped = tiles.tms_to_xyz(ty, z)
    np.testing.assert_array_equal(tiles.xyz_to_tms(flipped, z), ty)
    assert flipped[0] == 2**z - 1  # row flip rule gdalalg_raster_tile.cpp:510


def test_mercator_chain_agrees_with_direct_formula():
    rs = np.random.RandomState(7)
    lon = rs.uniform(-179.9, 179.9, 500)
    lat = rs.uniform(-84.9, 84.9, 500)
    for z in (3, 8, 12):
        mx, my = tiles.lonlat_to_meters(lon, lat)
        tx_m, ty_m = tiles.meters_to_tile(mx, my, z)  # TMS rows
        tx_d, ty_d = tiles.lonlat_to_tile(lon, lat, z, "tms")
        np.testing.assert_array_equal(tx_m, tx_d)
        np.testing.assert_array_equal(ty_m, ty_d)


def test_tile_bounds_contain_point():
    lon, lat = 13.4, 52.52
    z = 10
    mx, my = tiles.lonlat_to_meters(lon, lat)
    tx, ty = tiles.meters_to_tile(mx, my, z)
    minx, miny, maxx, maxy = tiles.tile_bounds_meters(tx, ty, z)
    assert minx <= mx <= maxx and miny <= my <= maxy


def test_parent_tile_rule():
    tx, ty = tiles.parent_tile(np.array([550]), np.array([335]), 10)
    assert (tx[0], ty[0]) == (275, 167)


def test_tile_pixel_in_range():
    rs = np.random.RandomState(3)
    lon = rs.uniform(-179, 179, 200)
    lat = rs.uniform(-84, 84, 200)
    tx, ty, col, row = tiles.tile_pixel(lon, lat, 5)
    assert ((col >= 0) & (col < 256)).all()
    assert ((row >= 0) & (row < 256)).all()
    tx2, ty2 = tiles.lonlat_to_tile(lon, lat, 5, "xyz")
    # pixel path (meters chain) and direct path agree on the tile
    np.testing.assert_array_equal(tx, tx2)
    np.testing.assert_array_equal(ty, ty2)


# --- cells -----------------------------------------------------------------


def test_morton_roundtrip():
    rs = np.random.RandomState(1)
    x = rs.randint(0, 2**20, 1000)
    y = rs.randint(0, 2**20, 1000)
    m = cells.morton(x, y)
    x2, y2 = cells.morton_decode(m)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)


def test_cell_roundtrip_and_level():
    lon = np.array([-179.0, 0.0, 13.4, 179.0])
    lat = np.array([-80.0, 0.0, 52.52, 80.0])
    c = cells.lonlat_to_cell(lon, lat, 12)
    lvl, tx, ty = cells.cell_to_tile(c)
    assert (lvl == 12).all()
    etx, ety = tiles.lonlat_to_tile(lon, lat, 12)
    np.testing.assert_array_equal(tx, etx)
    np.testing.assert_array_equal(ty, ety)


def test_cell_parent_is_prefix():
    lon, lat = np.array([13.4]), np.array([52.52])
    c12 = cells.lonlat_to_cell(lon, lat, 12)
    c4_direct = cells.lonlat_to_cell(lon, lat, 4)
    np.testing.assert_array_equal(cells.cell_parent(c12, 4), c4_direct)


def test_hilbert_order1_golden():
    # the canonical order-1 curve: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    d = cells.hilbert_from_tile(np.array([0, 0, 1, 1]),
                                np.array([0, 1, 1, 0]), 1)
    assert d.tolist() == [0, 1, 2, 3]


def test_hilbert_is_bijective_and_adjacent():
    order = 4
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = cells.hilbert_from_tile(xs.ravel(), ys.ravel(), order)
    assert sorted(d.tolist()) == list(range(n * n))  # bijection
    # locality: consecutive curve positions are grid neighbors
    order_idx = np.argsort(d)
    px, py = xs.ravel()[order_idx], ys.ravel()[order_idx]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps == 1).all()


def test_cells_covering_bbox_contains_interior_points():
    cov = set(cells.cells_covering_bbox(10.0, 40.0, 20.0, 50.0, 6).tolist())
    rs = np.random.RandomState(2)
    lon = rs.uniform(10.0, 20.0, 100)
    lat = rs.uniform(40.0, 50.0, 100)
    pts = cells.lonlat_to_cell(lon, lat, 6)
    assert set(pts.tolist()) <= cov


# --- predicates ------------------------------------------------------------


def _square(x0=0.0, y0=0.0, s=10.0):
    return wkb.box_polygon(x0, y0, x0 + s, y0 + s)


def test_pip_interior_boundary_exterior():
    p = predicates.PreparedPolygon.from_wkb(_square())
    px = np.array([5.0, 0.0, 10.0, 5.0, -1.0, 10.0001])
    py = np.array([5.0, 5.0, 10.0, 0.0, 5.0, 5.0])
    np.testing.assert_array_equal(
        p.covers(px, py), [True, True, True, True, False, False])
    np.testing.assert_array_equal(
        p.contains_properly(px, py), [True, False, False, False, False, False])


def test_pip_with_hole():
    blob = wkb.encode_polygon([
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(4, 4), (6, 4), (6, 6), (4, 6)],
    ])
    p = predicates.PreparedPolygon.from_wkb(blob)
    px = np.array([5.0, 2.0, 4.0])
    py = np.array([5.0, 2.0, 5.0])
    # center is inside the hole → not covered; hole boundary IS covered
    np.testing.assert_array_equal(p.covers(px, py), [False, True, True])
    np.testing.assert_array_equal(
        p.contains_properly(px, py), [False, True, False])


def test_pip_multipolygon():
    blob = wkb.encode_multipolygon([
        [[(0, 0), (1, 0), (1, 1), (0, 1)]],
        [[(5, 5), (6, 5), (6, 6), (5, 6)]],
    ])
    p = predicates.PreparedPolygon.from_wkb(blob)
    np.testing.assert_array_equal(
        p.covers(np.array([0.5, 5.5, 3.0]), np.array([0.5, 5.5, 3.0])),
        [True, True, False])


def test_pip_diamond_vs_abs_formula():
    """The diamond zone used by the query-suite oracle: |x|+|y| <= r."""
    r = 40.0025
    blob = wkb.encode_polygon([[(r, 0), (0, r), (-r, 0), (0, -r)]])
    p = predicates.PreparedPolygon.from_wkb(blob)
    rs = np.random.RandomState(4)
    px = rs.uniform(-60, 60, 3000)
    py = rs.uniform(-60, 60, 3000)
    expect = np.abs(px) + np.abs(py) <= r
    np.testing.assert_array_equal(p.covers(px, py), expect)


def test_pip_vertex_ray_robustness():
    """Ray passing exactly through vertices must not double-count."""
    blob = wkb.encode_polygon([[(0, 0), (2, 2), (4, 0), (4, 4), (0, 4)]])
    p = predicates.PreparedPolygon.from_wkb(blob)
    # y=2 passes exactly through the notch vertex (2,2)
    px = np.array([-1.0, 1.0, 2.0, 3.0, 5.0])
    py = np.full(5, 2.0)
    np.testing.assert_array_equal(
        p.covers(px, py), [False, True, True, True, False])


# --- STRtree ---------------------------------------------------------------


def test_strtree_matches_bruteforce():
    rs = np.random.RandomState(9)
    lo = rs.uniform(0, 90, (300, 2))
    b = np.hstack([lo, lo + rs.uniform(0.5, 5, (300, 2))])
    tree = strtree.STRtree(b)
    for _ in range(50):
        q = rs.uniform(0, 95, 2)
        qb = (q[0], q[1], q[0] + rs.uniform(0, 10), q[1] + rs.uniform(0, 10))
        brute = np.nonzero(
            (b[:, 0] <= qb[2]) & (b[:, 2] >= qb[0])
            & (b[:, 1] <= qb[3]) & (b[:, 3] >= qb[1]))[0]
        got = tree.query_bbox(*qb)
        np.testing.assert_array_equal(got, brute)


def test_strtree_empty_and_single():
    t0 = strtree.STRtree(np.empty((0, 4)))
    assert len(t0.query_bbox(0, 0, 1, 1)) == 0
    t1 = strtree.STRtree(np.array([[0, 0, 1, 1.0]]))
    assert t1.query_point(0.5, 0.5).tolist() == [0]
    assert t1.query_point(2, 2).tolist() == []


# --- CRS -------------------------------------------------------------------


def test_epsg3857_matches_tile_math():
    t = crs.Transformer.from_crs("EPSG:4326", "EPSG:3857")
    lon = np.linspace(-179, 179, 19)
    lat = np.linspace(-84, 84, 19)
    X, Y = t.transform(lon, lat)
    mx, my = tiles.lonlat_to_meters(lon, lat)
    np.testing.assert_allclose(X, mx, rtol=1e-15)
    np.testing.assert_allclose(Y, my, rtol=1e-15)


def test_utm31_known_point():
    """Golden: UTM 31N of (lon=3, lat=0) is exactly (500000, 0); the
    equator point at lon=0 is the textbook 166021.443 m easting."""
    t = crs.Transformer.from_crs("EPSG:4326", "EPSG:32631")
    E, N = t.transform(np.array([3.0, 0.0]), np.array([0.0, 0.0]))
    assert E[0] == pytest.approx(500000.0, abs=1e-6)
    assert N[0] == pytest.approx(0.0, abs=1e-6)
    assert E[1] == pytest.approx(166021.4430805, abs=1e-3)


def test_utm_roundtrip_nm_accuracy():
    t = crs.Transformer.from_crs("EPSG:4326", "EPSG:32631")
    inv = crs.Transformer.from_crs("EPSG:32631", "EPSG:4326")
    rs = np.random.RandomState(11)
    lon = rs.uniform(-3, 9, 200)  # zone ±6°
    lat = rs.uniform(-80, 84, 200)
    E, N = t.transform(lon, lat)
    lon2, lat2 = inv.transform(E, N)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_south_false_northing():
    t = crs.Transformer.from_crs("EPSG:4326", "EPSG:32731")
    _, N = t.transform(np.array([3.0]), np.array([-0.001]))
    assert N[0] < 10000000.0 and N[0] > 9999000.0


def test_transform_with_errors_flags():
    t = crs.Transformer.from_crs("EPSG:4326", "EPSG:3857")
    X, Y, ok = t.transform_with_errors(
        np.array([0.0, 0.0]), np.array([0.0, 95.0]))
    assert ok.tolist() == [True, False]
    assert np.isnan(X[1]) and np.isnan(Y[1])


# --- conic projections (LCC / Albers, Snyder 1987 formulas) ---------------


def test_conic_roundtrip_machine_precision():
    from gdal_ray.geom.crs import Transformer

    rs = np.random.RandomState(1)
    lon = rs.uniform(-125, -66, 500)
    lat = rs.uniform(24, 50, 500)
    for code in ("EPSG:5070", "EPSG:3978"):
        fwd = Transformer.from_crs("EPSG:4326", code)
        inv = Transformer.from_crs(code, "EPSG:4326")
        x, y, ok = fwd.transform_with_errors(lon, lat)
        lo2, la2, ok2 = inv.transform_with_errors(x, y)
        assert ok.all() and ok2.all()
        np.testing.assert_allclose(lo2, lon, atol=1e-11)
        np.testing.assert_allclose(la2, lat, atol=1e-11)


def test_albers_preserves_area_scale():
    """Equal-area property: the numeric Jacobian determinant equals the
    ellipsoidal area element to ~1e-7 everywhere in the domain."""
    from gdal_ray.geom.crs import Transformer, GRS80_A, GRS80_F

    t = Transformer.from_crs("EPSG:4326", "EPSG:5070")
    e2 = GRS80_F * (2 - GRS80_F)
    h = 1e-5
    for la in (25.0, 37.0, 49.0):
        lon = np.array([-96.0]); lat = np.array([la])
        x0, y0, _ = t.transform_with_errors(lon, lat)
        x1, y1, _ = t.transform_with_errors(lon + h, lat)
        x2, y2, _ = t.transform_with_errors(lon, lat + h)
        det = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) / h**2
        phi = np.radians(la)
        M = GRS80_A * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        N = GRS80_A / (1 - e2 * np.sin(phi) ** 2) ** 0.5
        true = M * np.cos(phi) * N * (np.pi / 180) ** 2
        assert abs(det / true - 1.0) < 1e-6


def test_lcc_unit_scale_on_standard_parallels():
    """Conformal scale factor k == 1 on both standard parallels."""
    import math

    from gdal_ray.geom.crs import Transformer, GRS80_A, GRS80_F

    t = Transformer.from_crs("EPSG:4326", "EPSG:3978")
    e2 = GRS80_F * (2 - GRS80_F)
    h = 1e-6
    for la in (49.0, 77.0):
        x0, y0, _ = t.transform_with_errors(np.array([-95.0]),
                                            np.array([la]))
        x1, y1, _ = t.transform_with_errors(np.array([-95.0 + h]),
                                            np.array([la]))
        Nr = GRS80_A / math.sqrt(1 - e2 * math.sin(math.radians(la)) ** 2)
        true = Nr * math.cos(math.radians(la)) * math.radians(h)
        k = float(np.hypot(x1 - x0, y1 - y0)) / true
        assert abs(k - 1.0) < 1e-8


def test_conic_dict_spec():
    """Arbitrary conic CRS via dict spec (custom parallels/ellipsoid)."""
    from gdal_ray.geom.crs import Transformer

    spec = {"proj": "lcc", "lat_1": 33.0, "lat_2": 45.0, "lat_0": 23.0,
            "lon_0": -96.0}
    t = Transformer.from_crs("EPSG:4326", spec)
    ti = Transformer.from_crs(spec, "EPSG:4326")
    x, y, ok = t.transform_with_errors(np.array([-75.0]), np.array([35.0]))
    assert ok.all() and np.isfinite(x).all()
    lo, la, _ = ti.transform_with_errors(x, y)
    np.testing.assert_allclose(lo, [-75.0], atol=1e-11)
    np.testing.assert_allclose(la, [35.0], atol=1e-11)


# --- curve geometries (CircularString / CompoundCurve / CurvePolygon) ----


def test_curve_wkb_roundtrip():
    from gdal_ray.geom import wkb as W

    cs = W.encode_circularstring([(2, 0), (0, 2), (-2, 0)])
    g = W.decode(cs)
    assert g["type"] == "CircularString"
    np.testing.assert_array_equal(
        g["coordinates"], [[2, 0], [0, 2], [-2, 0]])

    ls = W.encode_linestring([(-2, 0), (2, 0)])
    cc = W.encode_compoundcurve([cs, ls])
    g = W.decode(cc)
    assert g["type"] == "CompoundCurve"
    assert [p["type"] for p in g["parts"]] == ["CircularString",
                                               "LineString"]

    ring = W.encode_circularstring([(2, 0), (0, 2), (-2, 0), (0, -2),
                                    (2, 0)])
    cp = W.encode_curvepolygon([ring])
    g = W.decode(cp)
    assert g["type"] == "CurvePolygon"
    assert g["parts"][0]["type"] == "CircularString"

    mc = W.encode_multicurve([cs, ls])
    assert W.decode(mc)["type"] == "MultiCurve"
    ms = W.encode_multisurface([cp])
    assert W.decode(ms)["type"] == "MultiSurface"


def test_stroke_arc_semantics():
    from gdal_ray.geom import curves as C

    # CCW semicircle r=2: ceil(180/4)=45 segments, endpoints exact
    pts = C.stroke_arc((2, 0), (0, 2), (-2, 0))
    assert len(pts) == 46
    np.testing.assert_array_equal(pts[0], [2, 0])
    np.testing.assert_array_equal(pts[-1], [-2, 0])
    assert (pts[1:, 1] >= 0).all()  # stays in upper half-plane
    np.testing.assert_allclose(np.hypot(pts[:, 0], pts[:, 1]), 2.0,
                               atol=1e-12)
    # CW arc through (0,-2) stays in the lower half-plane
    cw = C.stroke_arc((2, 0), (0, -2), (-2, 0))
    assert (cw[1:-1, 1] < 0).all()
    # collinear triple degenerates to the 3-point polyline
    col = C.stroke_arc((0, 0), (1, 1), (2, 2))
    np.testing.assert_array_equal(col, [[0, 0], [1, 1], [2, 2]])


def test_linearize_curvepolygon_area():
    """Full circular ring strokes to a polygon whose shoelace area
    approaches πr² from below (inscribed polygon)."""
    from gdal_ray.geom import curves as C, wkb as W

    ring = W.encode_circularstring([(2, 0), (0, 2), (-2, 0), (0, -2),
                                    (2, 0)])
    g = C.linearize(W.decode(W.encode_curvepolygon([ring])))
    assert g["type"] == "Polygon"
    r0 = np.asarray(g["coordinates"][0])
    x, y = r0[:, 0], r0[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert 0.999 * np.pi * 4 < area < np.pi * 4


def test_linearize_wkb_reencodes():
    from gdal_ray.geom import curves as C, wkb as W

    cs = W.encode_circularstring([(2, 0), (0, 2), (-2, 0)])
    out = W.decode(C.linearize_wkb(cs))
    assert out["type"] == "LineString" and len(out["coordinates"]) == 46
    # compound: semicircle + return edge, shared endpoints dropped
    cc = W.encode_compoundcurve(
        [cs, W.encode_linestring([(-2, 0), (2, 0)])])
    out = W.decode(C.linearize_wkb(cc))
    assert out["type"] == "LineString" and len(out["coordinates"]) == 47


def test_polar_stereographic():
    """EPSG:3413/3031 (Snyder 21 variant B): roundtrip identity, unit
    scale at the standard parallel, pole at the origin, aspect signs."""
    from gdal_ray.geom.crs import Transformer, _parse_crs

    for code, lat_lo, lat_hi, ts in (("EPSG:3413", 55.0, 89.9, 70.0),
                                     ("EPSG:3031", -89.9, -55.0, -71.0)):
        fwd = Transformer.from_crs("EPSG:4326", code)
        inv = Transformer.from_crs(code, "EPSG:4326")
        rs = np.random.RandomState(13)
        lon = rs.uniform(-180, 180, 500)
        lat = rs.uniform(lat_lo, lat_hi, 500)
        x, y, ok = fwd.transform_with_errors(lon, lat)
        assert ok.all()
        lon2, lat2, _ = inv.transform_with_errors(x, y)
        dl = np.abs(((lon2 - lon + 180) % 360) - 180)
        assert dl.max() < 1e-9 and np.abs(lat2 - lat).max() < 1e-9
        p = _parse_crs(code)[1]["conic"]
        # pole → origin
        np.testing.assert_allclose(
            p.forward(0.0, 90.0 if ts > 0 else -90.0), (0.0, 0.0),
            atol=1e-6)
        # scale factor 1 at the standard parallel (along-meridian)
        x1, y1 = p.forward(0.0, ts - 0.0005)
        x2, y2 = p.forward(0.0, ts + 0.0005)
        e2 = p.e2
        M = 6378137.0 * (1 - e2) / (1 - e2 * np.sin(np.radians(ts)) ** 2) ** 1.5
        k = np.hypot(x2 - x1, y2 - y1) / (M * np.radians(0.001))
        assert abs(k - 1.0) < 1e-9
    # aspect: 3413 has lon −45 on the −y axis; 3031 has lon 0 on +y
    p = _parse_crs("EPSG:3413")[1]["conic"]
    x, y = p.forward(-45.0, 70.0)
    assert abs(x) < 1e-6 and y < 0
    p = _parse_crs("EPSG:3031")[1]["conic"]
    x, y = p.forward(0.0, -71.0)
    assert abs(x) < 1e-6 and y > 0
    # east of the central meridian is +x in both aspects
    assert _parse_crs("EPSG:3413")[1]["conic"].forward(45.0, 70.0)[0] > 0
    assert _parse_crs("EPSG:3031")[1]["conic"].forward(90.0, -71.0)[0] > 0


def test_curve_wkt_roundtrip():
    """Curve WKT ↔ WKB: parse → format → parse is byte-stable,
    including nested CompoundCurve rings and mixed MultiSurface."""
    from gdal_ray.geom import wkb as W

    samples = [
        "CIRCULARSTRING (2 0,0 2,-2 0)",
        "COMPOUNDCURVE (CIRCULARSTRING (2 0,0 2,-2 0),(-2 0,2 0))",
        "CURVEPOLYGON (CIRCULARSTRING (2 0,0 2,-2 0,0 -2,2 0))",
        "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (2 0,0 2,-2 0),"
        "(-2 0,2 0)))",
        "MULTICURVE (CIRCULARSTRING (2 0,0 2,-2 0),(0 0,1 1))",
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING "
        "(2 0,0 2,-2 0,0 -2,2 0)),((0 0,1 0,1 1,0 0)))",
    ]
    for s in samples:
        blob = W.wkt_to_wkb(s)
        rt = W.wkb_to_wkt(blob, precision=15)
        assert W.wkt_to_wkb(rt) == blob
    # WKT-parsed curve linearizes like the directly-encoded one
    from gdal_ray.geom.curves import linearize
    g = linearize(W.decode(W.wkt_to_wkb(samples[3])))
    assert g["type"] == "Polygon" and len(g["coordinates"][0]) == 47
