"""Contour extraction — per-tile marching squares over the tile table.

The reference's contour (alg/contour.cpp, marching-squares core in
alg/marching_squares/) re-expressed per tile: each 2x2 pixel-center
cell emits 0-2 line segments per level, linearly interpolated, in
GLOBAL z+8 pixel coordinates (pixel centers at integer+0.5).  Segment
soup output (the reference's polygon/ring assembly is a downstream
merge); cells straddling tile seams are not evaluated — at tiling zoom
z the gap is one pixel row/column per seam (documented limitation; the
seam-cell pass would mirror polygonize's border exchange).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

TILE = 256

# marching-squares segment table: case index (b0=TL, b1=TR, b2=BR,
# b3=BL above-level) → list of (edge_a, edge_b) pairs; edges 0=top,
# 1=right, 2=bottom, 3=left
_CASES: dict[int, list[tuple[int, int]]] = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(3, 0)],
    2: [(0, 1)], 13: [(0, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    8: [(2, 3)], 7: [(2, 3)],
    3: [(3, 1)], 12: [(3, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    5: [(3, 0), (1, 2)],   # ambiguous saddle: standard resolution
    10: [(0, 1), (2, 3)],
}


def _interp(va: np.ndarray, vb: np.ndarray, level: float) -> np.ndarray:
    d = vb - va
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(d != 0.0, (level - va) / d, 0.5)
    return np.clip(t, 0.0, 1.0)


def tile_contour_segments(grid: np.ndarray, level: float,
                          gx0: float, gy0: float) -> np.ndarray:
    """Marching squares on one tile → (n, 4) array of segment endpoints
    (x0, y0, x1, y1) in global pixel-center coordinates."""
    g = grid.astype(np.float64)
    tl = g[:-1, :-1]
    tr = g[:-1, 1:]
    br = g[1:, 1:]
    bl = g[1:, :-1]
    case = ((tl > level).astype(np.int64)
            | ((tr > level).astype(np.int64) << 1)
            | ((br > level).astype(np.int64) << 2)
            | ((bl > level).astype(np.int64) << 3))
    segs = []
    cy, cx = np.nonzero((case > 0) & (case < 15))
    if not len(cy):
        return np.empty((0, 4))
    cases = case[cy, cx]
    # edge point (global coords) per edge id for the selected cells
    x = gx0 + cx + 0.5
    y = gy0 + cy + 0.5
    a_tl, a_tr = tl[cy, cx], tr[cy, cx]
    a_br, a_bl = br[cy, cx], bl[cy, cx]
    edge_pts = {
        0: (x + _interp(a_tl, a_tr, level), y),                # top
        1: (x + 1.0, y + _interp(a_tr, a_br, level)),          # right
        2: (x + _interp(a_bl, a_br, level), y + 1.0),          # bottom
        3: (x, y + _interp(a_tl, a_bl, level)),                # left
    }
    for code, pairs in _CASES.items():
        if not pairs:
            continue
        m = cases == code
        if not m.any():
            continue
        for ea, eb in pairs:
            xa, ya = edge_pts[ea]
            xb, yb = edge_pts[eb]
            segs.append(np.column_stack([xa[m], ya[m], xb[m], yb[m]]))
    return np.vstack(segs) if segs else np.empty((0, 4))


def contour_segments(tiles_ds, levels):
    """Tile table → Dataset of contour segments:
    (z, level, x0, y0, x1, y1) in global pixel coordinates."""
    levels = [float(v) for v in levels]

    def per_tile(batch: pa.Table) -> pa.Table:
        zs, lv, x0s, y0s, x1s, y1s = [], [], [], [], [], []
        for z, x, y, blob in zip(batch["z"].to_pylist(),
                                 batch["x"].to_pylist(),
                                 batch["y"].to_pylist(),
                                 batch["raster"].to_pylist()):
            grid = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
                .reshape(TILE, TILE)
            for level in levels:
                s = tile_contour_segments(grid, level,
                                          int(x) * TILE, int(y) * TILE)
                if not len(s):
                    continue
                zs.append(np.full(len(s), z, dtype=np.int32))
                lv.append(np.full(len(s), level))
                x0s.append(s[:, 0])
                y0s.append(s[:, 1])
                x1s.append(s[:, 2])
                y1s.append(s[:, 3])
        cat = np.concatenate
        empty = np.empty(0)
        return pa.table({
            "z": pa.array(cat(zs) if zs else np.empty(0, np.int32)),
            "level": pa.array(cat(lv) if lv else empty, pa.float64()),
            "x0": pa.array(cat(x0s) if x0s else empty, pa.float64()),
            "y0": pa.array(cat(y0s) if y0s else empty, pa.float64()),
            "x1": pa.array(cat(x1s) if x1s else empty, pa.float64()),
            "y1": pa.array(cat(y1s) if y1s else empty, pa.float64()),
        })

    return tiles_ds.map_batches(per_tile, batch_format="pyarrow")
