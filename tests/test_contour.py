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
