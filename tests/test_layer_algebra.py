"""Polygon×polygon layer algebra goldens.

Mirrors autotest/ogr/ogr_layer_algebra.py's fixture style: tiny layers
with hand-computable expected areas/geometries for every operation,
plus kernel-level invariants (piece disjointness, area conservation)
the reference gets for free from GEOS."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as _wkb
from gdal_ray.geom.clip import (
    convex_difference_pieces,
    difference_many,
    pieces_area,
    ring_area,
    sh_clip,
)
from gdal_ray.geom.ops import wkb_area
from gdal_ray.stages.layer_algebra import layer_algebra


def _box(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], float)


def _box_wkb(x0, y0, x1, y1):
    return _wkb.box_polygon(x0, y0, x1, y1)


# --- kernel ---------------------------------------------------------------


def test_sh_clip_rect_rect():
    out = sh_clip(_box(0, 0, 10, 10), _box(5, 5, 15, 15))
    assert ring_area(out) == pytest.approx(25.0, abs=1e-12)


def test_sh_clip_diamond_box():
    r = 4.0
    dia = np.array([(r, 0), (0, r), (-r, 0), (0, -r)], float)
    # right half of the diamond: area = r*r (half of 2r^2)
    out = sh_clip(dia, _box(0, -10, 10, 10))
    assert ring_area(out) == pytest.approx(r * r, abs=1e-12)


def test_sh_clip_touching_boxes_empty():
    assert len(sh_clip(_box(0, 0, 5, 5), _box(5, 0, 10, 5))) == 0


def test_difference_pieces_disjoint_and_conserve():
    A, B = _box(0, 0, 10, 10), _box(5, 5, 15, 15)
    pieces = convex_difference_pieces(A, B)
    assert pieces_area(pieces) == pytest.approx(75.0, abs=1e-9)
    # pieces pairwise disjoint (mutual clip has no area)
    for i, p in enumerate(pieces):
        for q in pieces[i + 1:]:
            assert abs(ring_area(sh_clip(p, q))) < 1e-9
    # conservation: inter + diff == subject
    inter = abs(ring_area(sh_clip(A, B)))
    assert inter + pieces_area(pieces) == pytest.approx(100.0, abs=1e-9)


def test_difference_concave_subject():
    U = np.array([(0, 0), (6, 0), (6, 6), (4, 6), (4, 2), (2, 2),
                  (2, 6), (0, 6)], float)
    assert ring_area(U) == pytest.approx(28.0)
    hole = _box(1, 1, 5, 5)
    inter = abs(ring_area(sh_clip(U, hole)))
    diff = pieces_area(difference_many(U, [hole]))
    assert inter == pytest.approx(10.0, abs=1e-9)
    assert diff == pytest.approx(18.0, abs=1e-9)


def test_difference_many_overlapping_clips():
    # two overlapping clips must not double-subtract their overlap
    A = _box(0, 0, 10, 10)
    c1, c2 = _box(2, 2, 6, 6), _box(4, 4, 8, 8)
    # union of clips area inside A = 16 + 16 - 4 = 28
    left = pieces_area(difference_many(A, [c1, c2]))
    assert left == pytest.approx(100 - 28, abs=1e-9)


# --- layer ops ------------------------------------------------------------


@pytest.fixture()
def _layers():
    inp = pa.table({
        "poly_id": pa.array([0, 1], pa.int32()),
        "geometry": pa.array([_box_wkb(0, 0, 10, 10),
                              _box_wkb(20, 0, 30, 10)], pa.binary()),
    })
    meth = pa.table({
        "grid_id": pa.array([0, 1], pa.int32()),
        "geometry": pa.array([_box_wkb(5, 5, 25, 15),
                              _box_wkb(-5, -5, 2, 2)], pa.binary()),
    })
    return inp, meth


def _areas(df):
    return sorted(round(wkb_area(g), 6) for g in df["geometry"])


def test_union_covers_everything(ray_session, _layers):
    import ray.data as rd

    inp, meth = _layers
    out = layer_algebra(rd.from_arrow(inp), meth, "union").to_pandas()
    # total area of the union decomposition == area(A)+area(B)+area(M)-inter
    total = sum(wkb_area(g) for g in out["geometry"])
    # inputs 100+100, methods 200+49, overlaps 25+25+4
    assert total == pytest.approx(100 + 100 + 200 + 49 - 54, abs=1e-9)
    # every row class present: pair pieces, input leftover, method leftover
    has_pair = ((out["poly_id"].notna()) & (out["grid_id"].notna())).any()
    has_in = ((out["poly_id"].notna()) & (out["grid_id"].isna())).any()
    has_m = ((out["poly_id"].isna()) & (out["grid_id"].notna())).any()
    assert has_pair and has_in and has_m


def test_clip_overlapping_method_not_double_counted(ray_session):
    import ray.data as rd

    inp = pa.table({
        "poly_id": pa.array([0], pa.int32()),
        "geometry": pa.array([_box_wkb(0, 0, 10, 10)], pa.binary()),
    })
    meth = pa.table({
        "grid_id": pa.array([0, 1], pa.int32()),
        "geometry": pa.array([_box_wkb(2, 2, 6, 6), _box_wkb(4, 4, 8, 8)],
                             pa.binary()),
    })
    out = layer_algebra(rd.from_arrow(inp), meth, "clip").to_pandas()
    assert len(out) == 1
    # UnaryUnion semantics: 16 + 16 - 4 overlap counted once
    assert wkb_area(out["geometry"].iloc[0]) == pytest.approx(28.0,
                                                              abs=1e-9)


def test_diamond_intersection_golden(ray_session):
    import ray.data as rd

    r = 4.0
    dia = _wkb.encode_polygon([[(r, 0.0), (0.0, r), (-r, 0.0),
                                (0.0, -r), (r, 0.0)]])
    inp = pa.table({"poly_id": pa.array([0], pa.int32()),
                    "geometry": pa.array([dia], pa.binary())})
    meth = pa.table({"grid_id": pa.array([0], pa.int32()),
                     "geometry": pa.array([_box_wkb(0, -10, 10, 10)],
                                          pa.binary())})
    out = layer_algebra(rd.from_arrow(inp), meth,
                        "intersection").to_pandas()
    assert len(out) == 1
    assert wkb_area(out["geometry"].iloc[0]) == pytest.approx(r * r,
                                                              abs=1e-9)
    # and the erase leftover is the other half
    left = layer_algebra(rd.from_arrow(inp), meth, "erase").to_pandas()
    assert wkb_area(left["geometry"].iloc[0]) == pytest.approx(r * r,
                                                               abs=1e-9)


def test_keep_lower_dimension_geometries(ray_session):
    import ray.data as rd

    inp = pa.table({"poly_id": pa.array([0], pa.int32()),
                    "geometry": pa.array([_box_wkb(0, 0, 5, 5)],
                                         pa.binary())})
    meth = pa.table({"grid_id": pa.array([0], pa.int32()),
                     "geometry": pa.array([_box_wkb(5, 0, 10, 5)],
                                          pa.binary())})
    ds = rd.from_arrow(inp)
    # default: zero-area contact dropped (1 row with KLDG, 0 without)
    out0 = layer_algebra(ds, meth, "intersection").to_pandas()
    assert len(out0) == 0
    out1 = layer_algebra(ds, meth, "intersection",
                         keep_lower_dims=True).to_pandas()
    assert len(out1) == 1
    g = _wkb.decode(out1["geometry"].iloc[0])
    assert g["type"] in ("LineString", "Point")


def test_update_replaces_method_area(ray_session, _layers):
    import ray.data as rd

    inp, meth = _layers
    out = layer_algebra(rd.from_arrow(inp), meth, "update").to_pandas()
    # input leftovers 71 + 75, method features whole 200 + 49
    assert _areas(out) == [49.0, 71.0, 75.0, 200.0]


def test_symdifference_areas(ray_session, _layers):
    import ray.data as rd

    inp, meth = _layers
    out = layer_algebra(rd.from_arrow(inp), meth,
                        "symdifference").to_pandas()
    assert _areas(out) == [45.0, 71.0, 75.0, 150.0]


def test_dissolve_overlap_counted_once(ray_session):
    """Union area of overlapping polygons == inclusion-exclusion."""
    import ray.data as rd

    from gdal_ray.stages.layer_algebra import dissolve

    inp = pa.table({
        "k": pa.array(["g", "g", "g"], pa.string()),
        "geometry": pa.array([
            _box_wkb(0, 0, 10, 10),      # 100
            _box_wkb(5, 5, 15, 15),      # 100, overlap 25 with first
            _box_wkb(40, 40, 42, 42),    # 4, disjoint
        ], pa.binary()),
    })
    out = dissolve(rd.from_arrow(inp), "k").to_pandas()
    assert len(out) == 1
    assert out["n_features"].iloc[0] == 3
    area = wkb_area(out["geometry"].iloc[0])
    assert area == pytest.approx(100 + 100 - 25 + 4, abs=1e-9)


def test_input_with_hole_and_multipart(ray_session):
    """Holed and multi-part INPUT features: a donut (10x10 outer with
    a 2x2 hole) intersected/erased against a method box — areas follow
    the hole exactly; a 2-part multipolygon works unexploded."""
    import ray.data as rd

    donut = _wkb.encode_polygon([
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)],     # hole, 4 px
    ])
    two = _wkb.encode_multipolygon([
        [[(20, 0), (24, 0), (24, 4), (20, 4), (20, 0)]],
        [[(30, 0), (32, 0), (32, 2), (30, 2), (30, 0)]],
    ])
    inp = pa.table({"poly_id": pa.array([0, 1], pa.int32()),
                    "geometry": pa.array([donut, two], pa.binary())})
    meth = pa.table({"grid_id": pa.array([0], pa.int32()),
                     "geometry": pa.array([_box_wkb(3, 3, 22, 7)],
                                          pa.binary())})
    ds = rd.from_arrow(inp)
    inter = layer_algebra(ds, meth, "intersection").to_pandas()
    # donut ∩ box = 7x4 window minus the 2x2 hole = 28 - 4 = 24
    a0 = wkb_area(inter[inter["poly_id"] == 0]["geometry"].iloc[0])
    assert a0 == pytest.approx(24.0, abs=1e-9)
    # multipart ∩ box = part1 (20..22 x 3..4) = 2*1 = 2 (part2 disjoint)
    a1 = wkb_area(inter[inter["poly_id"] == 1]["geometry"].iloc[0])
    assert a1 == pytest.approx(2.0, abs=1e-9)
    erase = layer_algebra(ds, meth, "erase").to_pandas()
    # donut \ box = (100 - 4) - 24 = 72 ; multipart \ box = (16+4) - 2
    e0 = wkb_area(erase[erase["poly_id"] == 0]["geometry"].iloc[0])
    e1 = wkb_area(erase[erase["poly_id"] == 1]["geometry"].iloc[0])
    assert e0 == pytest.approx(72.0, abs=1e-9)
    assert e1 == pytest.approx(18.0, abs=1e-9)
    # union still works (pieces of a convex outer are convex)
    uni = layer_algebra(ds, meth, "union").to_pandas()
    total = sum(wkb_area(g) for g in uni["geometry"])
    # area(donut)+area(parts)+area(method) - overlaps = 96+20+76-26
    assert total == pytest.approx(96 + 20 + 76 - 26, abs=1e-9)


def test_concave_method_feature(ray_session):
    """A concave (L-shaped) METHOD feature is ear-clipped internally:
    intersection/erase/union areas follow the L exactly."""
    import ray.data as rd

    L = _wkb.encode_polygon([[(0, 0), (8, 0), (8, 2), (2, 2), (2, 8),
                              (0, 8), (0, 0)]])  # area 16+12 = 28
    inp = pa.table({"poly_id": pa.array([0], pa.int32()),
                    "geometry": pa.array([_box_wkb(1, 1, 9, 9)],
                                         pa.binary())})
    meth = pa.table({"grid_id": pa.array([0], pa.int32()),
                     "geometry": pa.array([L], pa.binary())})
    ds = rd.from_arrow(inp)
    inter = layer_algebra(ds, meth, "intersection").to_pandas()
    # box(1..9)^2 ∩ L: bottom bar (1..8 x 1..2)=7 + left bar
    # (1..2 x 2..8)=6 → 13
    assert wkb_area(inter["geometry"].iloc[0]) == pytest.approx(13.0,
                                                                abs=1e-9)
    erase = layer_algebra(ds, meth, "erase").to_pandas()
    assert wkb_area(erase["geometry"].iloc[0]) == pytest.approx(
        64 - 13, abs=1e-9)
    uni = layer_algebra(ds, meth, "union").to_pandas()
    total = sum(wkb_area(g) for g in uni["geometry"])
    assert total == pytest.approx(64 + 28 - 13, abs=1e-9)


def test_ear_clip_exact_partition():
    """Triangulation partitions hard concave shapes exactly (area sum
    equal, pairwise disjoint) — incl. the reflex-vertex-on-diagonal
    case that strict containment tests miss."""
    from gdal_ray.geom.clip import ear_clip_triangulate

    cases = [
        np.array([(-100, -40), (20, -40), (20, -10), (-40, -10),
                  (-40, 20), (-100, 20)], float),
        np.array([(0, 0), (4, 1), (8, 0), (7, 4), (8, 8), (4, 7),
                  (0, 8), (1, 4)], float),
        np.array([(0, 0), (10, 0), (10, 10), (2, 10), (2, 4), (4, 4),
                  (4, 8), (8, 8), (8, 2), (0, 2)], float),
    ]
    for poly in cases:
        tris = ear_clip_triangulate(poly)
        assert pieces_area(tris) == pytest.approx(abs(ring_area(poly)),
                                                  abs=1e-9)
        for i, a in enumerate(tris):
            for b in tris[i + 1:]:
                assert abs(ring_area(sh_clip(a, b))) < 1e-9


def test_triangulate_with_holes_exact_partition():
    """Hole bridging (bridge_holes) + ear clipping partitions
    outer-minus-holes exactly — concave holes, multiple holes, concave
    outer with a concave hole."""
    from gdal_ray.geom.clip import triangulate_with_holes

    sq = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    L = np.array([(2, 2), (6, 2), (6, 4), (4, 4), (4, 8), (2, 8)], float)
    star = np.array([(5, 3), (6, 5), (8, 5), (6.5, 6.5), (7, 8.5),
                     (5, 7.3), (3, 8.5), (3.5, 6.5), (2, 5), (4, 5)],
                    float)
    U = np.array([(0, 0), (12, 0), (12, 10), (8, 10), (8, 4), (4, 4),
                  (4, 10), (0, 10)], float)
    step = np.array([(1, 1), (3, 1), (3, 3), (2, 3), (2, 2), (1, 2)],
                    float)
    cases = [
        (sq, [L]),
        (sq, [star]),
        (sq, [L, np.array([(7, 6), (9, 6), (9, 9), (7, 9)], float)]),
        (sq, [L, np.array([(7, 1), (9, 1), (9, 3), (8, 3), (8, 2),
                           (7, 2)], float)]),
        (U, [step]),
    ]
    for outer, holes in cases:
        tris = triangulate_with_holes(outer, holes)
        want = abs(ring_area(outer)) - sum(abs(ring_area(h))
                                           for h in holes)
        assert pieces_area(tris) == pytest.approx(want, abs=1e-9)
        for i, a in enumerate(tris):
            for b in tris[i + 1:]:
                assert abs(ring_area(sh_clip(a, b))) < 1e-9


def test_layer_algebra_concave_hole_union(ray_session):
    """Union with concave holes on BOTH layers: every output area is
    a closed-form signed-rectangle sum (the poly_union_holes oracle
    fixture)."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geom.ops import wkb_area
    from gdal_ray.pipelines.queries import _holes_fixture
    from gdal_ray.stages.layer_algebra import layer_algebra

    inp, meth = _holes_fixture()
    out = layer_algebra(rd.from_arrow(inp), meth, "union",
                        input_schema_table=inp.slice(0, 0)).to_pandas()
    got = {}
    for _, r in out.iterrows():
        key = (None if pd.isna(r["poly_id"]) else int(r["poly_id"]),
               None if pd.isna(r["mkey"]) else int(r["mkey"]))
        got[key] = got.get(key, 0.0) + wkb_area(r["geometry"])
    # closed-form: A=rect(130x100)-L(1800), B=rect(130x100);
    # M=rect(180x70)-L(3000); A∩M=(80x70 within A's x<=-20... ) use
    # signed-rect sums
    def ra(x0, y0, x1, y1):
        return max(0.0, x1 - x0) * max(0.0, y1 - y0)
    icomp = [(0, 1, -150, -55, -20, 45), (0, -1, -130, -30, -110, 20),
             (0, -1, -110, -30, -70, -10), (1, 1, 0, -55, 130, 45)]
    mcomp = [(1, -100, -40, 80, 30), (-1, -60, -20, 0, 20),
             (-1, 0, -20, 30, 0)]
    pair = {}
    for pid, si, ix0, iy0, ix1, iy1 in icomp:
        for sm, mx0, my0, mx1, my1 in mcomp:
            pair[pid] = pair.get(pid, 0.0) + si * sm * ra(
                max(ix0, mx0), max(iy0, my0), min(ix1, mx1),
                min(iy1, my1))
    a_area = ra(-150, -55, -20, 45) - ra(-130, -30, -110, 20) \
        - ra(-110, -30, -70, -10)
    b_area = ra(0, -55, 130, 45)
    m_area = ra(-100, -40, 80, 30) - ra(-60, -20, 0, 20) \
        - ra(0, -20, 30, 0)
    assert got[(0, 0)] == pytest.approx(pair[0], abs=1e-6)
    assert got[(1, 0)] == pytest.approx(pair[1], abs=1e-6)
    assert got[(0, None)] == pytest.approx(a_area - pair[0], abs=1e-6)
    assert got[(1, None)] == pytest.approx(b_area - pair[1], abs=1e-6)
    assert got[(None, 0)] == pytest.approx(m_area - pair[0] - pair[1],
                                           abs=1e-6)
