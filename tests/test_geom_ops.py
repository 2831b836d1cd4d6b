"""Unit tests for geometry unary ops (geom.ops) — golden values from
closed-form math, mirroring the reference's hand-computed oracles
(SURVEY.md §5 pattern 4)."""

import numpy as np
import pytest

from gdal_ray.geom import ops, wkb


def test_area_box_and_hole():
    box = wkb.box_polygon(0, 0, 10, 5)
    assert ops.wkb_area(box) == pytest.approx(50.0)
    holed = wkb.encode_polygon([
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(2, 2), (4, 2), (4, 4), (2, 4)],
    ])
    assert ops.wkb_area(holed) == pytest.approx(100.0 - 4.0)


def test_area_multipolygon_and_nonareal():
    mp = wkb.encode_multipolygon([
        [[(0, 0), (1, 0), (1, 1), (0, 1)]],
        [[(5, 5), (7, 5), (7, 7), (5, 7)]],
    ])
    assert ops.wkb_area(mp) == pytest.approx(1.0 + 4.0)
    assert ops.wkb_area(wkb.encode_point(3, 4)) == 0.0
    assert ops.wkb_area(wkb.encode_linestring([(0, 0), (5, 5)])) == 0.0


def test_centroid_box_diamond_hole():
    box = wkb.box_polygon(2, 4, 6, 10)
    assert ops.wkb_centroid(box) == pytest.approx((4.0, 7.0))
    r = 3.0
    diamond = wkb.encode_polygon([[(r, 0), (0, r), (-r, 0), (0, -r)]])
    cx, cy = ops.wkb_centroid(diamond)
    assert (cx, cy) == pytest.approx((0.0, 0.0), abs=1e-12)
    # hole pulls centroid away: square [0,4]^2 with hole [3,4]x[0,1]
    holed = wkb.encode_polygon([
        [(0, 0), (4, 0), (4, 4), (0, 4)],
        [(3, 0), (4, 0), (4, 1), (3, 1)],
    ])
    # exact: (16*2 - 1*3.5)/15, (16*2 - 1*0.5)/15
    cx, cy = ops.wkb_centroid(holed)
    assert cx == pytest.approx(28.5 / 15)
    assert cy == pytest.approx(31.5 / 15)


def test_centroid_hole_winding_independent():
    """Holes subtract regardless of the ring winding direction."""
    cw_hole = [(3, 0), (3, 1), (4, 1), (4, 0)]  # opposite winding
    holed = wkb.encode_polygon([[(0, 0), (4, 0), (4, 4), (0, 4)], cw_hole])
    cx, cy = ops.wkb_centroid(holed)
    assert cx == pytest.approx(28.5 / 15)
    assert cy == pytest.approx(31.5 / 15)


def test_convex_hull_drops_interior_and_collinear():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4],
                    [2, 2], [2, 0]])  # interior pt + collinear edge pt
    hull = ops.convex_hull_points(pts)
    assert sorted(map(tuple, hull)) == [(0, 0), (0, 4), (4, 0), (4, 4)]


def test_convex_hull_wkb_of_multipoint_line():
    line = wkb.encode_linestring([(0, 0), (1, 3), (2, 0), (3, 3), (4, 0)])
    hull = wkb.decode(ops.wkb_convex_hull(line))
    assert hull["type"] == "Polygon"
    assert ops.wkb_area(ops.wkb_convex_hull(line)) == pytest.approx(9.0)


def test_simplify_collinear_and_tolerance():
    line = wkb.encode_linestring([(0, 0), (1, 0.01), (2, 0), (3, 2), (4, 0)])
    # tol 0.1 removes the 0.01 bump, keeps the 2.0 spike
    out = wkb.decode(ops.wkb_simplify(line, 0.1))["coordinates"]
    assert [tuple(p) for p in out] == [(0, 0), (2, 0), (3, 2), (4, 0)]
    # large tol removes everything but endpoints
    out2 = wkb.decode(ops.wkb_simplify(line, 10.0))["coordinates"]
    assert len(out2) == 2


def test_segmentize_max_length():
    line = wkb.encode_linestring([(0, 0), (10, 0)])
    out = wkb.decode(ops.wkb_segmentize(line, 3.0))["coordinates"]
    seglens = np.hypot(*np.diff(out, axis=0).T)
    assert (seglens <= 3.0 + 1e-12).all()
    assert tuple(out[0]) == (0, 0) and tuple(out[-1]) == (10, 0)


def test_swap_xy_roundtrip():
    poly = wkb.box_polygon(1, 2, 3, 4)
    swapped = ops.wkb_swap_xy(poly)
    g = wkb.decode(swapped)
    ring = g["coordinates"][0]
    assert ring[:, 0].min() == 2 and ring[:, 1].min() == 1
    assert ops.wkb_swap_xy(swapped) == poly or \
        ops.wkb_area(ops.wkb_swap_xy(swapped)) == ops.wkb_area(poly)


def test_point_buffer_area_converges():
    blob = ops.point_buffer(5.0, -3.0, 2.0, quadsegs=30)
    # 120-gon area = 0.5 * n * r^2 * sin(2π/n)
    n = 120
    expect = 0.5 * n * 4.0 * np.sin(2 * np.pi / n)
    assert ops.wkb_area(blob) == pytest.approx(expect, rel=1e-12)
    cx, cy = ops.wkb_centroid(blob)
    assert (cx, cy) == pytest.approx((5.0, -3.0), abs=1e-9)


def test_buffer_polygon_convex():
    # unit square, d=1, quadsegs=30: Minkowski identity
    # A + P·d + 4 fans of 30 segs over 90°
    blob = ops.wkb_buffer(wkb.box_polygon(0, 0, 1, 1), 1.0, quadsegs=30)
    exp = 1.0 + 4.0 + 4 * 30 * 0.5 * np.sin((np.pi / 2) / 30)
    assert ops.wkb_area(blob) == pytest.approx(exp, rel=1e-12)
    ring = wkb.decode(blob)["coordinates"][0]
    assert len(ring) == 4 + 4 * 30 + 1  # E + Σn + closing vertex
    # orientation-insensitive: CW input gives the same buffer
    cw = wkb.encode_polygon([[(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]])
    assert ops.wkb_area(ops.wkb_buffer(cw, 1.0, 30)) == \
        pytest.approx(exp, rel=1e-12)


def test_buffer_polygon_reflex_and_fences():
    # L-shape: reflex vertex trims to the offset intersection; the
    # closed form is A + P·d + 5 convex fans − d² (the 90° reflex
    # overlap)
    L = wkb.encode_polygon([[(0, 0), (4, 0), (4, 4), (2, 4), (2, 2),
                             (0, 2), (0, 0)]])
    d = 0.3
    got = ops.wkb_area(ops.wkb_buffer(L, d, quadsegs=30))
    exp = 12.0 + 16.0 * d + 5 * 30 * 0.5 * d * d * \
        np.sin((np.pi / 2) / 30) - d * d
    assert got == pytest.approx(exp, rel=1e-10)
    # distance too large for the concavity → simplicity fence
    with pytest.raises(NotImplementedError):
        ops.wkb_buffer(L, 3.0)
    # holes are supported for POSITIVE buffer (1x1 hole collapses at
    # d=1 and is filled); over-eroding negative distances are fenced
    holed = wkb.encode_polygon([[(0, 0), (9, 0), (9, 9), (0, 9), (0, 0)],
                                [(4, 4), (4, 5), (5, 5), (5, 4), (4, 4)]])
    g = wkb.decode(ops.wkb_buffer(holed, 1.0))
    assert len(g["coordinates"]) == 1  # the 1x1 hole collapsed
    with pytest.raises(NotImplementedError):
        ops.wkb_buffer(wkb.box_polygon(0, 0, 1, 1), -2.0)


def test_explode_parts():
    mp = wkb.encode_multipolygon([
        [[(0, 0), (1, 0), (1, 1), (0, 1)]],
        [[(5, 5), (6, 5), (6, 6), (5, 6)]],
    ])
    parts = ops.explode_parts(mp)
    assert len(parts) == 2
    assert all(wkb.decode(p)["type"] == "Polygon" for p in parts)
    pt = wkb.encode_point(1, 2)
    assert ops.explode_parts(pt) == [pt]


def test_is_valid():
    assert ops.wkb_is_valid(wkb.box_polygon(0, 0, 1, 1))
    degenerate = wkb.encode_polygon([[(0, 0), (1, 1), (2, 2)]])  # zero area
    assert not ops.wkb_is_valid(degenerate)
    assert not ops.wkb_is_valid(b"\x01\x99\x00\x00\x00")
    assert ops.wkb_is_valid(wkb.encode_point(np.inf, 0)) is False


def test_make_valid_structural():
    import numpy as np

    from gdal_ray.geom import wkb as _wkb
    from gdal_ray.geom.ops import (ring_signed_area, wkb_area,
                                   wkb_make_valid)

    # CW outer ring with a duplicated vertex → CCW, dedup'd, closed
    bad = _wkb.encode_polygon([[(0, 0), (0, 4), (0, 4), (4, 4), (4, 0),
                                (0, 0)]])
    fixed = wkb_make_valid(bad)
    g = _wkb.decode(fixed)
    ring = np.asarray(g["coordinates"][0])
    assert wkb_area(fixed) == 16.0
    assert ring_signed_area(ring) > 0           # outer CCW
    assert len(ring) == 5                        # dedup'd + closed
    # degenerate ring collapses to None
    assert wkb_make_valid(
        _wkb.encode_polygon([[(0, 0), (1, 1), (0, 0)]])) is None


def test_concave_hull_alpha_shape():
    import numpy as np

    from gdal_ray.geom.ops import concave_hull_points, convex_hull_points

    rs = np.random.RandomState(5)
    th = rs.uniform(0.5, 2 * np.pi - 0.5, 500)
    r = rs.uniform(8, 10, 500)
    pts = np.column_stack([r * np.cos(th), r * np.sin(th)])

    def area(p):
        x, y = p[:, 0], p[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, -1))
                         - np.dot(y, np.roll(x, -1)))

    concave = concave_hull_points(pts, alpha=3.0)
    convex = convex_hull_points(pts)
    # the alpha shape follows the C-shaped annulus; the convex hull
    # bridges the opening and the hole
    assert area(concave) < 0.5 * area(convex)
    # alpha → ∞ degenerates to the convex hull
    big = concave_hull_points(pts, alpha=1e9)
    assert abs(area(big) - area(convex)) < 1e-6


def test_buffer_polygon_erosion():
    # convex erosion: exact inward half-plane intersection
    out = ops.wkb_buffer(wkb.box_polygon(0, 0, 10, 6), -1.0)
    assert ops.wkb_area(out) == pytest.approx(32.0, abs=1e-12)
    assert len(wkb.decode(out)["coordinates"][0]) == 5
    r, d = 5.0, 1.0
    dia = wkb.encode_polygon([[(r, 0), (0, r), (-r, 0), (0, -r),
                               (r, 0)]])
    exp = 2 * r * r - 4 * np.sqrt(2) * r * d + 4 * d * d
    assert ops.wkb_area(ops.wkb_buffer(dia, -d)) == \
        pytest.approx(exp, rel=1e-12)
    # straight-skeleton event (edge collapse) and concavity are fenced
    with pytest.raises(NotImplementedError):
        ops.wkb_buffer(wkb.box_polygon(0, 0, 10, 6), -3.5)
    L = wkb.encode_polygon([[(0, 0), (4, 0), (4, 4), (2, 4), (2, 2),
                             (0, 2), (0, 0)]])
    with pytest.raises(NotImplementedError):
        ops.wkb_buffer(L, -0.2)
    # zero distance is the identity
    b = wkb.box_polygon(0, 0, 2, 2)
    assert ops.wkb_buffer(b, 0.0) == b


def test_buffer_linestring_capsule():
    """Line buffer = capsule union via the degenerate-ring
    construction (round caps + joins, quadsegs 30)."""
    fan2 = 2 * 60 * 0.5 * np.sin(np.pi / 60)  # two caps at d=1
    # single horizontal / vertical / diagonal segments (the axis-
    # aligned ones exercise the atan2(-0, -1) cap sign trap)
    for pts, L in ([(0, 0), (10, 0)], 10.0), ([(0, 0), (0, 7)], 7.0), \
                  ([(0, 0), (3, 4)], 5.0):
        line = wkb.encode_linestring(pts)
        out = ops.wkb_buffer(line, 1.0, 30)
        assert ops.wkb_area(out) == pytest.approx(2 * L + fan2,
                                                  rel=1e-12)
        assert len(wkb.decode(out)["coordinates"][0]) == 123
    # right-angle polyline: join fan on the convex side, miter trim on
    # the reflex side
    out = ops.wkb_buffer(
        wkb.encode_linestring([(0, 0), (10, 0), (10, 8)]), 1.0, 30)
    th = np.pi / 2
    exp = 2 * 18.0 + fan2 + 30 * 0.5 * np.sin(th / 30) - np.tan(th / 2)
    assert ops.wkb_area(out) == pytest.approx(exp, rel=1e-12)
    # self-overlapping buffer (hairpin) is fenced
    with pytest.raises(NotImplementedError):
        ops.wkb_buffer(
            wkb.encode_linestring([(0, 0), (10, 0), (0, 0.05)]), 1.0)
    # closed ring input is rejected (buffer the polygon instead)
    with pytest.raises(NotImplementedError):
        ops.wkb_buffer(
            wkb.encode_linestring([(0, 0), (4, 0), (4, 4), (0, 0)]), 1.0)


def test_buffer_polygon_with_holes():
    """Positive buffer dilates the outer ring and erodes convex holes;
    a collapsing hole is filled (GEOS semantics)."""
    outer = [(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]
    hole = [(8, 8), (8, 12), (12, 12), (12, 8), (8, 8)]
    poly = wkb.encode_polygon([outer, hole])
    out = ops.wkb_buffer(poly, 1.0, 30)
    g = wkb.decode(out)
    assert len(g["coordinates"]) == 2
    exp_outer = 400 + 80 + 120 * 0.5 * np.sin(2 * np.pi / 120)
    assert ops.wkb_area(out) == pytest.approx(exp_outer - 4.0, rel=1e-12)
    # hole ring is CW (OGC winding)
    assert ops.ring_signed_area(np.asarray(g["coordinates"][1])) < 0
    # d >= half the hole width: the hole collapses and is filled
    g2 = wkb.decode(ops.wkb_buffer(poly, 2.5, 30))
    assert len(g2["coordinates"]) == 1
    # negative distance with holes stays fenced
    with pytest.raises(NotImplementedError):
        ops.wkb_buffer(poly, -0.5)
