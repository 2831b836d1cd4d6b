"""Scanline rasterization vs literal transcriptions of the reference
loops (alg/llrasterize.cpp) on randomized geometry, plus end-to-end
rasterize() merge/all-touched behavior."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.geom import wkb as gwkb
from gdal_ray.stages.rasterize import (fill_pixels, line_pixels,
                                       rasterize, touched_pixels)


def ref_filled_polygon(rings, W, H):
    """Literal transcription of GDALdllImageFilledPolygon
    (llrasterize.cpp:58-228), single part list, returns pixel set."""
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    sizes = [len(r) for r in rings]
    n = len(xs)
    out = set()
    miny = int(max(0.0, ys.min()))
    maxy = int(min(ys.max(), H - 1.0))
    maxx = W - 1
    for y in range(miny, maxy + 1):
        dy = y + 0.5
        ints = []
        ints2 = []
        partoffset = 0
        part = 0
        for i in range(n):
            if i == partoffset + sizes[part]:
                partoffset += sizes[part]
                part += 1
            if i == partoffset:
                ind1 = partoffset + sizes[part] - 1
                ind2 = partoffset
            else:
                ind1, ind2 = i - 1, i
            dy1, dy2 = ys[ind1], ys[ind2]
            if (dy1 < dy and dy2 < dy) or (dy1 > dy and dy2 > dy):
                continue
            if dy1 < dy2:
                dx1, dx2 = xs[ind1], xs[ind2]
            elif dy1 > dy2:
                dy1, dy2 = dy2, dy1
                dx2, dx1 = xs[ind1], xs[ind2]
            else:
                if xs[ind1] > xs[ind2]:
                    h1 = np.floor(xs[ind2] + 0.5)
                    h2 = np.floor(xs[ind1] + 0.5)
                    if h1 > maxx or h2 <= 0:
                        continue
                    ints2.append((int(max(h1, 0.0)), int(min(h2, W))))
                continue
            if dy < dy2 and dy >= dy1:
                inter = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
                inter = min(max(inter, -2147483648.0), 2147483647.0)
                ints.append(int(np.floor(inter + 0.5)))
        ints.sort()
        for i in range(0, len(ints) - 1, 2):
            if ints[i] <= maxx and ints[i + 1] > 0:
                for x in range(max(ints[i], 0),
                               min(ints[i + 1] - 1, maxx) + 1):
                    out.add((y, x))
        for a, b in ints2:
            for x in range(a, b):
                if 0 <= x <= maxx:
                    out.add((y, x))
    return out


def ref_image_line(paths, W, H):
    """Literal transcription of GDALdllImageLine
    (llrasterize.cpp:256-391), returns burned pixel list with
    multiplicity."""
    out = []
    for path in paths:
        m = len(path)
        for j in range(1, m):
            dfX, dfY = path[j - 1]
            dfXE, dfYE = path[j]
            iX, iY = int(np.floor(dfX)), int(np.floor(dfY))
            iX1, iY1 = int(np.floor(dfXE)), int(np.floor(dfYE))
            ndx, ndy = abs(iX1 - iX), abs(iY1 - iY)
            xstep = -1 if iX > iX1 else 1
            ystep = -1 if iY > iY1 else 1
            if ndx >= ndy:
                xerr = ndy << 1
                yerr = xerr - (ndx << 1)
                err = xerr - ndx
                if j != m - 1:
                    ndx -= 1
                while ndx >= 0:
                    ndx -= 1
                    if 0 <= iX < W and 0 <= iY < H:
                        out.append((iY, iX))
                    iX += xstep
                    if err > 0:
                        iY += ystep
                        err += yerr
                    else:
                        err += xerr
            else:
                xerr = ndx << 1
                yerr = xerr - (ndy << 1)
                err = xerr - ndy
                if j != m - 1:
                    ndy -= 1
                while ndy >= 0:
                    ndy -= 1
                    if 0 <= iX < W and 0 <= iY < H:
                        out.append((iY, iX))
                    iY += ystep
                    if err > 0:
                        iX += xstep
                        err += yerr
                    else:
                        err += xerr
    return out


def _rand_ring(rng, W, H, nv):
    """Random simple-ish star polygon around a random center."""
    cx = rng.uniform(2, W - 2)
    cy = rng.uniform(2, H - 2)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rad = rng.uniform(0.5, min(W, H) / 2.5, nv)
    ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)],
                    axis=1)
    return np.vstack([ring, ring[:1]])


def test_fill_matches_reference_transcription():
    rng = np.random.default_rng(7)
    W = H = 40
    for trial in range(40):
        nv = rng.integers(3, 9)
        ring = _rand_ring(rng, W, H, int(nv))
        rings = [ring]
        if trial % 3 == 0:  # add a hole
            hole = (ring - ring.mean(axis=0)) * 0.4 + ring.mean(axis=0)
            rings.append(hole[::-1].copy())
        exp = ref_filled_polygon(rings, W, H)
        xs = np.concatenate([r[:, 0] for r in rings])
        ys = np.concatenate([r[:, 1] for r in rings])
        sz = np.array([len(r) for r in rings], np.int64)
        py, px = fill_pixels(xs, ys, sz, 0, H - 1, 0, W - 1, H)
        got = set(zip(py.tolist(), px.tolist()))
        assert got == exp, f"trial {trial}: {got ^ exp}"


def test_fill_horizontal_center_segment():
    # bottom edge exactly at a pixel-center height, right-to-left:
    # fills separately (llrasterize.cpp:155-185)
    ring = np.array([[1.25, 2.5], [6.75, 2.5], [6.75, 5.25],
                     [1.25, 5.25], [1.25, 2.5]])
    exp = ref_filled_polygon([ring], 10, 10)
    py, px = fill_pixels(ring[:, 0], ring[:, 1], np.array([5]),
                         0, 9, 0, 9, 10)
    assert set(zip(py.tolist(), px.tolist())) == exp
    assert (2, 3) in exp  # the center-height row did fill


def test_line_matches_reference_transcription():
    rng = np.random.default_rng(11)
    W = H = 32
    for _ in range(60):
        m = int(rng.integers(2, 6))
        path = np.stack([rng.uniform(-3, W + 3, m),
                         rng.uniform(-3, H + 3, m)], axis=1)
        exp = ref_image_line([path], W, H)
        py, px = line_pixels(path[:, 0], path[:, 1],
                             np.array([m], np.int64), 0, H - 1, 0, W - 1)
        got = list(zip(py.tolist(), px.tolist()))
        assert sorted(got) == sorted(exp)


def test_touched_square_and_aligned_skip():
    # off-grid square: boundary touches the 4 edge bands
    ring = np.array([[1.4, 1.4], [4.6, 1.4], [4.6, 4.6], [1.4, 4.6],
                     [1.4, 1.4]])
    py, px = touched_pixels(ring[:, 0], ring[:, 1], np.array([5]),
                            0, 9, 0, 9)
    got = set(zip(py.tolist(), px.tolist()))
    exp = {(y, x) for x in range(1, 5) for y in (1, 4)} | \
          {(y, x) for y in range(1, 5) for x in (1, 4)}
    assert got == exp
    # grid-aligned square: every edge lies on grid lines → intersect-
    # only skips all of them (EPSILON_INTERSECT_ONLY semantics)
    ring2 = np.array([[2.0, 2.0], [5.0, 2.0], [5.0, 5.0], [2.0, 5.0],
                      [2.0, 2.0]])
    py, px = touched_pixels(ring2[:, 0], ring2[:, 1], np.array([5]),
                            0, 9, 0, 9)
    assert len(py) == 0


def test_rasterize_end_to_end(ray_session):
    # two overlapping squares in lon/lat on a 16x16 raster of 1-degree
    # pixels; gt maps lon/lat == pixel coords directly
    gt = (0.0, 1.0, 16.0, -1.0)  # px = lon, py = 16 - lat

    def sq(x0, y0, x1, y1):
        return gwkb.box_polygon(x0, y0, x1, y1)

    # in pixel space: A = [2.2,7.8]^2 → px 2..7 ; B = [5.2,10.8]^2
    t = pa.table({
        "fid": pa.array([0, 1], pa.int64()),
        "burn": pa.array([10.0, 3.0]),
        "geometry": pa.array([sq(2.2, 16 - 7.8, 7.8, 16 - 2.2),
                              sq(5.2, 16 - 10.8, 10.8, 16 - 5.2)],
                             pa.binary()),
    })

    def grid(ds):
        tb = ds.to_pandas()
        return {(r.py, r.px): r.val for r in tb.itertuples()}

    # REPLACE: overlap gets the later feature's burn (3.0)
    rep = grid(rasterize(t, gt=gt, width=16, height=16, tile=4,
                         n_buckets=3))
    a_only = {(y, x) for y in range(2, 8) for x in range(2, 8)}
    b_only = {(y, x) for y in range(5, 11) for x in range(5, 11)}
    assert set(rep) == a_only | b_only
    assert rep[(3, 3)] == 10.0 and rep[(9, 9)] == 3.0
    assert rep[(6, 6)] == 3.0  # overlap: last wins

    # ADD: overlap sums once per feature
    add = grid(rasterize(t, gt=gt, width=16, height=16,
                         merge_alg="add", tile=4, n_buckets=3))
    assert add[(3, 3)] == 10.0 and add[(9, 9)] == 3.0
    assert add[(6, 6)] == 13.0

    # ALL_TOUCHED widens by the boundary band: px 2..7 grows to 2..7
    # (centers) ∪ boundary-touched 2..7 → for A ([2.2,7.8]) the
    # touched band is cols/rows 2..7 already; shrink A to [2.6,7.4]
    # so fill is 3..6 but touched is 2..7
    t2 = pa.table({
        "fid": pa.array([0], pa.int64()),
        "burn": pa.array([1.0]),
        "geometry": pa.array([sq(2.6, 16 - 7.4, 7.4, 16 - 2.6)],
                             pa.binary()),
    })
    base = grid(rasterize(t2, gt=gt, width=16, height=16, tile=4,
                          n_buckets=3))
    at = grid(rasterize(t2, gt=gt, width=16, height=16,
                        all_touched=True, tile=4, n_buckets=3))
    assert set(base) == {(y, x) for y in range(3, 7)
                         for x in range(3, 7)}
    assert set(at) == {(y, x) for y in range(2, 8) for x in range(2, 8)}
    # ADD + ALL_TOUCHED still burns once per pixel (visited-set rule)
    at_add = grid(rasterize(t2, gt=gt, width=16, height=16,
                            all_touched=True, merge_alg="add", tile=4,
                            n_buckets=3))
    assert set(at_add.values()) == {1.0}


def test_rasterize_add_multipart_burns_once_per_feature(ray_session):
    """merge_alg=add with a MultiPolygon whose parts overlap the same
    pixels: the visited-points rule (gdalrasterize.cpp:84-115) burns
    once per FEATURE, not once per part — regression for the per-part
    dedup that double-added shared pixels."""
    gt = (0.0, 1.0, 8.0, -1.0)

    def ring(x0, y0, x1, y1):
        return [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]]

    # two parts of ONE feature covering the identical pixel square
    mp = gwkb.encode_multipolygon([ring(1.2, 8 - 4.8, 4.8, 8 - 1.2),
                                   ring(1.2, 8 - 4.8, 4.8, 8 - 1.2)])
    t = pa.table({
        "burn": pa.array([2.0]),
        "geometry": pa.array([mp], pa.binary()),
    })
    out = rasterize(t, gt=gt, width=8, height=8, merge_alg="add",
                    tile=4, n_buckets=2).to_pandas()
    assert set(out["val"]) == {2.0}  # not 4.0
    # and two distinct FEATURES on the same pixels still sum
    t2 = pa.table({
        "burn": pa.array([2.0, 2.0]),
        "geometry": pa.array(
            [gwkb.box_polygon(1.2, 8 - 4.8, 4.8, 8 - 1.2)] * 2,
            pa.binary()),
    })
    out2 = rasterize(t2, gt=gt, width=8, height=8, merge_alg="add",
                     tile=4, n_buckets=2).to_pandas()
    assert set(out2["val"]) == {4.0}


def test_rasterize_burn_from_z_and_lines(ray_session):
    gt = (0.0, 1.0, 8.0, -1.0)
    line = gwkb.encode_linestring([(0.3, 8 - 0.7), (6.7, 8 - 5.2)])
    t = pa.table({
        "burn": pa.array([5.0]),
        "z": pa.array([2.5]),
        "geometry": pa.array([line], pa.binary()),
    })
    out = rasterize(t, gt=gt, width=8, height=8, lines=True,
                    z_col="z", tile=4, n_buckets=2).to_pandas()
    assert set(out["val"]) == {7.5}
    exp = ref_image_line([np.array([[0.3, 0.7], [6.7, 5.2]])], 8, 8)
    assert sorted(zip(out["py"], out["px"])) == sorted(exp)


def test_rasterize_burn_from_wkb_z(ray_session):
    """burn_from_z reads the FIRST vertex's Z out of Z-typed WKB
    (gdalrasterize.cpp:745-760) and adds it to the burn value."""
    gt = (0.0, 1.0, 8.0, -1.0)
    ring = [(1.2, 8 - 4.8, 7.5), (4.8, 8 - 4.8, 7.5),
            (4.8, 8 - 1.2, 7.5), (1.2, 8 - 1.2, 7.5),
            (1.2, 8 - 4.8, 7.5)]
    t = pa.table({
        "burn": pa.array([2.0]),
        "geometry": pa.array([gwkb.encode_polygon_z([ring])],
                             pa.binary()),
    })
    out = rasterize(t, gt=gt, width=8, height=8, burn_from_z=True,
                    tile=4, n_buckets=2).to_pandas()
    assert set(out["val"]) == {9.5}
    # 2-D WKB contributes Z = 0 (first_z returns None)
    assert gwkb.first_z(gwkb.box_polygon(0, 0, 1, 1)) is None
    assert gwkb.first_z(gwkb.encode_polygon_z([ring])) == 7.5
    assert gwkb.first_z(
        gwkb.encode_linestring_z([(0, 0, 3.25), (1, 1, 9.0)])) == 3.25


def test_touched_lines_keep_grid_aligned():
    # lines use bIntersectOnly=false: a vertical segment exactly on a
    # grid line burns the column on its floor side (the reference's
    # vertical special case with iX = floor(dfXEnd))
    path = np.array([[3.0, 1.2], [3.0, 4.7]])
    py, px = touched_pixels(path[:, 0], path[:, 1],
                            np.array([2], np.int64), 0, 9, 0, 9,
                            intersect_only=False)
    got = set(zip(py.tolist(), px.tolist()))
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}
    # the same segment is skipped under polygon (intersect-only) rules
    py2, _ = touched_pixels(path[:, 0], path[:, 1],
                            np.array([2], np.int64), 0, 9, 0, 9)
    assert len(py2) == 0
