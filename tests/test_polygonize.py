"""Distributed polygonize tests: per-tile labeling vs brute-force BFS,
and the cross-tile seam merge."""

import zlib

import numpy as np
import pyarrow as pa

from gdal_ray.stages.polygonize import (TILE, label_components,
                                        polygonize_regions)


def _bfs_components(mask: np.ndarray) -> int:
    """Brute-force 4-connected component count."""
    seen = np.zeros_like(mask, dtype=bool)
    n = 0
    h, w = mask.shape
    for sy, sx in zip(*np.nonzero(mask)):
        if seen[sy, sx]:
            continue
        n += 1
        stack = [(sy, sx)]
        seen[sy, sx] = True
        while stack:
            y, x = stack.pop()
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w and mask[yy, xx] \
                        and not seen[yy, xx]:
                    seen[yy, xx] = True
                    stack.append((yy, xx))
    return n


def test_label_components_matches_bfs():
    rs = np.random.RandomState(3)
    for density in (0.2, 0.5, 0.8):
        mask = rs.random_sample((64, 64)) < density
        lbl = label_components(mask)
        got = len(np.unique(lbl[mask]))
        assert got == _bfs_components(mask)
        assert (lbl[~mask] == -1).all()


def _tile_row(x, y, grid):
    return {
        "z": 5, "x": x, "y": y,
        "n_pages": int(grid.sum()),
        "raster": zlib.compress(grid.astype(">u2").tobytes(), 6),
    }


def test_cross_tile_merge(ray_session):
    import ray.data as rd

    # a horizontal bar spanning the seam between tiles (0,0) and (1,0)
    g0 = np.zeros((TILE, TILE), dtype=np.int64)
    g1 = np.zeros((TILE, TILE), dtype=np.int64)
    g0[10, 250:256] = 1
    g1[10, 0:6] = 1
    # plus an isolated blob in tile (1,0)
    g1[100:103, 100:103] = 2
    ds = rd.from_items([_tile_row(0, 0, g0), _tile_row(1, 0, g1)])
    regions = polygonize_regions(ds).to_pandas()
    assert len(regions) == 2
    bar = regions[regions["n_tiles"] == 2].iloc[0]
    assert bar["n_pixels"] == 12
    assert bar["min_gx"] == 250 and bar["max_gx"] == TILE + 5
    blob = regions[regions["n_tiles"] == 1].iloc[0]
    assert blob["n_pixels"] == 9


def test_vertical_seam_and_region_id_deterministic(ray_session):
    import ray.data as rd

    g0 = np.zeros((TILE, TILE), dtype=np.int64)
    g1 = np.zeros((TILE, TILE), dtype=np.int64)
    g0[255, 7] = 1   # bottom edge of (0,0)
    g1[0, 7] = 1     # top edge of (0,1) — vertically adjacent
    ds = rd.from_items([_tile_row(0, 0, g0), _tile_row(0, 1, g1)])
    r1 = polygonize_regions(ds).to_pandas()
    r2 = polygonize_regions(ds).to_pandas()
    assert len(r1) == 1 and r1["n_pixels"].iloc[0] == 2
    assert r1["region_id"].iloc[0] == r2["region_id"].iloc[0]
    # region id = min global pixel key = gy*2^40+gx of the (0,0) pixel
    assert r1["region_id"].iloc[0] == 255 * (1 << 40) + 7


def test_world_top_edge_does_not_merge(ray_session):
    """Tiles at y=0: the top-edge seam (gy0-1 == -1) lies outside the
    world grid.  Emitting it would collapse every y=0 top border onto
    one key and spuriously merge non-adjacent regions that touch
    global pixel row 0 (ADVICE round 2)."""
    import ray.data as rd

    g0 = np.zeros((TILE, TILE), dtype=np.int64)
    g2 = np.zeros((TILE, TILE), dtype=np.int64)
    g0[0, 10:13] = 1   # touches world row gy=0 in tile (0,0)
    g2[0, 40:45] = 1   # touches world row gy=0 in tile (2,0) — NOT adjacent
    ds = rd.from_items([_tile_row(0, 0, g0), _tile_row(2, 0, g2)])
    regions = polygonize_regions(ds).to_pandas()
    assert len(regions) == 2
    assert sorted(regions["n_pixels"].tolist()) == [3, 5]


def test_world_left_edge_does_not_merge(ray_session):
    """Symmetric guard for gx0-1 == -1 at x=0 tiles."""
    import ray.data as rd

    g0 = np.zeros((TILE, TILE), dtype=np.int64)
    g1 = np.zeros((TILE, TILE), dtype=np.int64)
    g0[10:12, 0] = 1   # touches world column gx=0 in tile (0,0)
    g1[200:204, 0] = 1  # touches world column gx=0 in tile (0,1)
    ds = rd.from_items([_tile_row(0, 0, g0), _tile_row(0, 1, g1)])
    regions = polygonize_regions(ds).to_pandas()
    assert len(regions) == 2


def test_polygonize_8connected_cross_tile(ray_session):
    import zlib
    from collections import deque

    import numpy as np
    import ray.data as rd
    from gdal_ray.stages.polygonize import polygonize_regions

    rs = np.random.RandomState(19)
    mosaic = np.zeros((512, 512), np.int64)
    pts = rs.randint(0, 512, (300, 2))
    mosaic[pts[:, 0], pts[:, 1]] = 1
    # exact diagonal contacts across the tile corner and seams
    mosaic[255, 255] = 1
    mosaic[256, 256] = 1
    mosaic[254, 256] = 1  # diagonal across the vertical seam
    mosaic[256, 254] = 1
    rows = []
    for tx in range(2):
        for ty in range(2):
            sub = mosaic[ty * 256:(ty + 1) * 256,
                         tx * 256:(tx + 1) * 256]
            rows.append({"z": 4, "x": tx, "y": ty, "n_pages": 1,
                         "raster": zlib.compress(
                             sub.astype(">u2").tobytes(), 6)})

    def brute(conn):
        seen = np.zeros_like(mosaic, bool)
        sizes = []
        offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if conn == 8:
            offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for sy, sx in zip(*np.nonzero(mosaic)):
            if seen[sy, sx]:
                continue
            q, n = deque([(sy, sx)]), 0
            seen[sy, sx] = True
            while q:
                cy, cx = q.popleft()
                n += 1
                for dy, dx in offs:
                    yy, xx = cy + dy, cx + dx
                    if 0 <= yy < 512 and 0 <= xx < 512 \
                            and mosaic[yy, xx] and not seen[yy, xx]:
                        seen[yy, xx] = True
                        q.append((yy, xx))
            sizes.append(n)
        return sorted(sizes)

    for conn in (4, 8):
        got = polygonize_regions(rd.from_items(rows),
                                 connectedness=conn).to_pandas()
        assert sorted(got["n_pixels"].tolist()) == brute(conn), conn
    # 8-conn must actually merge more than 4-conn on this fixture
    assert len(brute(8)) < len(brute(4))
