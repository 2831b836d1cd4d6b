"""Marching-squares contour tests against analytically known isolines."""

import zlib

import numpy as np
import pyarrow as pa

from gdal_ray.stages.contour import (TILE, contour_segments,
                                     tile_contour_segments)


def test_vertical_gradient_isoline():
    """grid value = column index → level-L contour is the vertical line
    x = L (in pixel-center coordinates, between the straddling cells)."""
    grid = np.tile(np.arange(64, dtype=np.float64), (64, 1))
    segs = tile_contour_segments(grid, level=10.0, gx0=0.0, gy0=0.0)
    assert len(segs) == 63  # one segment per cell row
    xs = np.concatenate([segs[:, 0], segs[:, 2]])
    np.testing.assert_allclose(xs, 10.5)  # centers at +0.5: crosses 10.5
    # segments are vertical unit steps
    np.testing.assert_allclose(np.abs(segs[:, 3] - segs[:, 1]), 1.0)


def test_circle_contour_radius():
    """radial field → level-R contour points lie near radius R."""
    yy, xx = np.mgrid[0:128, 0:128]
    cx = cy = 63.5
    grid = np.hypot(xx - cx, yy - cy)
    segs = tile_contour_segments(grid, level=30.0, gx0=0.0, gy0=0.0)
    assert len(segs) > 50
    mid = np.column_stack([(segs[:, 0] + segs[:, 2]) / 2 - (cx + 0.5),
                           (segs[:, 1] + segs[:, 3]) / 2 - (cy + 0.5)])
    r = np.hypot(mid[:, 0], mid[:, 1])
    np.testing.assert_allclose(r, 30.0, atol=1.0)


def test_flat_field_no_segments():
    grid = np.full((32, 32), 7.0)
    assert len(tile_contour_segments(grid, 7.0, 0, 0)) == 0
    assert len(tile_contour_segments(grid, 3.0, 0, 0)) == 0


def test_contour_dataset_stage(ray_session):
    import ray.data as rd

    grid = np.zeros((TILE, TILE), dtype=np.int64)
    grid[100:150, 100:150] = 10  # a plateau → closed square-ish contour
    row = {"z": 4, "x": 2, "y": 3, "n_pages": int(grid.sum()),
           "raster": zlib.compress(grid.astype(">u2").tobytes(), 6)}
    out = contour_segments(rd.from_items([row]), levels=[5.0]).to_pandas()
    assert len(out) > 0
    # all segments near the plateau boundary, in GLOBAL coordinates
    assert (out["x0"] >= 2 * TILE + 99).all()
    assert (out["x0"] <= 2 * TILE + 151).all()
    assert (out["y0"] >= 3 * TILE + 99).all()
    assert set(out["level"]) == {5.0}


def _tile_row(z, x, y, grid):
    return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
            "raster": zlib.compress(grid.astype(">u2").tobytes(), 6)}


def _seg_set(x0, y0, x1, y1):
    """Canonical (order-independent) segment set with quantized coords."""
    q = lambda v: np.round(np.asarray(v) * 1048576).astype(np.int64)
    out = set()
    for a, b, c, d in zip(q(x0), q(y0), q(x1), q(y1)):
        out.add((min((a, b), (c, d)), max((a, b), (c, d))))
    return out


def test_seam_cells_match_single_array_run(ray_session):
    """An isoline crossing tile boundaries is gap-free: the distributed
    tiled run emits EXACTLY the segments of one marching-squares pass
    over the zero-padded 2x2-tile mosaic."""
    import ray.data as rd

    rs = np.random.RandomState(7)
    mosaic = np.zeros((2 * TILE, 2 * TILE), dtype=np.int64)
    # a blob straddling all four tiles + random speckle at the seams
    yy, xx = np.mgrid[0:2 * TILE, 0:2 * TILE]
    mosaic[np.hypot(xx - TILE, yy - TILE) < 60] = 9
    mosaic[TILE - 2:TILE + 2, :] += rs.randint(0, 5, (4, 2 * TILE))
    mosaic[:, TILE - 2:TILE + 2] += rs.randint(0, 5, (2 * TILE, 4))
    rows = [_tile_row(3, 4 + tx, 5 + ty,
                      mosaic[ty * TILE:(ty + 1) * TILE,
                             tx * TILE:(tx + 1) * TILE])
            for tx in range(2) for ty in range(2)]
    level = 4.0
    got = contour_segments(rd.from_items(rows), levels=[level]).to_pandas()
    got_set = _seg_set(got["x0"], got["y0"], got["x1"], got["y1"])

    # golden: single marching-squares pass over the zero-padded mosaic
    pad = np.zeros((2 * TILE + 2, 2 * TILE + 2), dtype=np.float64)
    pad[1:-1, 1:-1] = mosaic
    ref = tile_contour_segments(pad, level,
                                gx0=4 * TILE - 1, gy0=5 * TILE - 1)
    ref_set = _seg_set(ref[:, 0], ref[:, 1], ref[:, 2], ref[:, 3])
    # restrict golden to cells INSIDE the mosaic's seam/interior area:
    # the pad ring cells (outer boundary) are the zero-padded closure,
    # which the tiled run also emits only where a tile exists — here
    # all 4 tiles exist, so the sets must match exactly
    assert got_set == ref_set


def test_seam_against_missing_neighbor_zero_fill(ray_session):
    """A tile edge with value > level against an ABSENT neighbor tile
    must emit seam segments (absent tile == zeros)."""
    import ray.data as rd

    grid = np.full((TILE, TILE), 7, dtype=np.int64)
    out = contour_segments(rd.from_items([_tile_row(2, 1, 1, grid)]),
                           levels=[3.0]).to_pandas()
    # the single-array golden over the zero-padded tile
    pad = np.zeros((TILE + 2, TILE + 2))
    pad[1:-1, 1:-1] = grid
    ref = tile_contour_segments(pad, 3.0, gx0=TILE - 1, gy0=TILE - 1)
    assert _seg_set(out["x0"], out["y0"], out["x1"], out["y1"]) == \
        _seg_set(ref[:, 0], ref[:, 1], ref[:, 2], ref[:, 3])


def test_assemble_polylines_circle(ray_session):
    """Segment soup of a closed isoline assembles into ONE closed
    polyline whose points chain end-to-end."""
    import ray.data as rd

    from gdal_ray.stages.contour import assemble_polylines

    grid = np.zeros((TILE, TILE), dtype=np.int64)
    yy, xx = np.mgrid[0:TILE, 0:TILE]
    grid[np.hypot(xx - 80, yy - 90) < 40] = 8
    segs = contour_segments(rd.from_items([_tile_row(1, 0, 0, grid)]),
                            levels=[4.0], seams=False)
    lines = assemble_polylines(segs).to_pandas()
    assert len(lines) == 1
    assert bool(lines["closed"].iloc[0])
    from gdal_ray.geom import wkb as _wkb
    g = _wkb.decode(lines["wkb"].iloc[0])
    pts = np.asarray(g["coordinates"])
    # consecutive points are adjacent (no jumps): max step ~ 1 cell
    d = np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1]))
    assert d.max() < 1.5
    assert lines["n_pts"].iloc[0] >= 50


def test_assemble_polylines_cross_region_stitch(ray_session):
    """Small regions force the isoline into many per-region fragments;
    the stage-2 stitch must still deliver ONE closed polyline identical
    in point-set to the single-gather plan."""
    import ray.data as rd

    from gdal_ray.stages.contour import assemble_polylines

    grid = np.zeros((TILE, TILE), dtype=np.int64)
    yy, xx = np.mgrid[0:TILE, 0:TILE]
    grid[np.hypot(xx - 80, yy - 90) < 40] = 8
    segs = contour_segments(rd.from_items([_tile_row(1, 0, 0, grid)]),
                            levels=[4.0], seams=False)
    one = assemble_polylines(segs, region_px=None).to_pandas()
    segs2 = contour_segments(rd.from_items([_tile_row(1, 0, 0, grid)]),
                             levels=[4.0], seams=False)
    many = assemble_polylines(segs2, region_px=32).to_pandas()
    assert len(one) == 1 and len(many) == 1
    assert bool(many["closed"].iloc[0])
    assert many["n_pts"].iloc[0] == one["n_pts"].iloc[0]
    from gdal_ray.geom import wkb as _wkb
    pts1 = np.asarray(_wkb.decode(one["wkb"].iloc[0])["coordinates"])
    pts2 = np.asarray(_wkb.decode(many["wkb"].iloc[0])["coordinates"])
    q = lambda p: set(map(tuple, np.round(p * 1048576).astype(np.int64)))
    assert q(pts1) == q(pts2)


def test_fused_polylines_match_unfused(ray_session):
    """contour_polylines_ds (single fused seam+walk exchange) emits
    exactly the polylines of the two-exchange assemble_polylines plan:
    at a non-integer level the segment graph is junction-free, so the
    maximal chains are unique regardless of walk partitioning."""
    import ray.data as rd
    from gdal_ray.geom import wkb as gwkb
    from gdal_ray.stages.contour import (assemble_polylines,
                                         contour_polylines_ds)

    rs = np.random.RandomState(11)
    mosaic = np.zeros((2 * TILE, 2 * TILE), dtype=np.int64)
    yy, xx = np.mgrid[0:2 * TILE, 0:2 * TILE]
    mosaic[np.hypot(xx - TILE, yy - TILE) < 70] = 9
    mosaic[TILE - 2:TILE + 2, :] += rs.randint(0, 5, (4, 2 * TILE))
    rows = [_tile_row(3, 4 + tx, 5 + ty,
                      mosaic[ty * TILE:(ty + 1) * TILE,
                             tx * TILE:(tx + 1) * TILE])
            for tx in range(2) for ty in range(2)]

    def canon(df):
        out = set()
        for w in df["wkb"]:
            c = np.asarray(gwkb.decode(w)["coordinates"])
            q = [tuple(p) for p in
                 np.round(c * 1048576).astype(np.int64).tolist()]
            if q[0] == q[-1]:  # closed: canonical rotation + direction
                body = q[:-1]
                i = body.index(min(body))
                body = body[i:] + body[:i]
                rev = [body[0]] + body[1:][::-1]
                body = min(body, rev)
                q = body + [body[0]]
            elif q[-1] < q[0]:
                q = q[::-1]
            out.add(tuple(q))
        return out

    segs = contour_segments(rd.from_items(rows), levels=[4.5])
    a = canon(assemble_polylines(segs, region_px=64).to_pandas())
    b = canon(contour_polylines_ds(rd.from_items(rows), levels=[4.5],
                                   region_px=64).to_pandas())
    assert a == b and len(a) > 0
