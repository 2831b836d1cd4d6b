"""Hierarchical space-filling-curve cell ids over WebMercatorQuad.

The engine's `cell` column is a 64-bit hierarchical cell id in the spirit
of S2/H3 (neither native lib exists in this environment): a Morton
(Z-order) interleave of the XYZ tile coordinates at a given level,
packed together with the level.  Like S2 cell ids it has the two
properties the pipeline relies on:

- **prefix/ancestor**: `cell_parent(cell, k)` is a pure bit-shift, so
  `cell_prefix` (the level-k ancestor) is a valid partitioning /
  pruning key for any level >= k;
- **locality**: Z-order is a space-filling curve, so sorting by cell id
  clusters spatially-near rows (the spatial-sort step of
  apps/gdalalg_vector_sort.cpp:351-375 re-expressed as `ds.sort('cell')`).

Layout (uint64): bits[63:58]=level (0..29), bits[57:0]=morton code of
(x, y) at that level, left-aligned at bit 0 (i.e. the raw 2*level-bit
code).  Parent extraction: morton >> 2*(level-k).
"""

from __future__ import annotations

import numpy as np

from . import tiles

MAX_LEVEL = 29


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so bit i moves to bit 2i (uint64)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits: keep even bits, compact to low half."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton(x, y) -> np.ndarray:
    """Interleave x (even bits) and y (odd bits)."""
    return _spread_bits(np.asarray(x)) | (_spread_bits(np.asarray(y)) << np.uint64(1))


def morton_decode(m) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m, dtype=np.uint64)
    return _compact_bits(m), _compact_bits(m >> np.uint64(1))


def tile_to_cell(tx, ty, level) -> np.ndarray:
    """Pack XYZ tile coords at `level` into a cell id."""
    lvl = np.uint64(level)
    if level > MAX_LEVEL:
        raise ValueError(f"level {level} > {MAX_LEVEL}")
    return (lvl << np.uint64(58)) | morton(tx, ty)


def lonlat_to_cell(lon, lat, level) -> np.ndarray:
    """lon/lat degrees → cell id at `level` (tile zoom = level, XYZ rows)."""
    tx, ty = tiles.lonlat_to_tile(lon, lat, level, convention="xyz")
    return tile_to_cell(tx, ty, level)


def cell_level(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.uint64) >> np.uint64(58)).astype(np.int64)


def cell_to_tile(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (level, tx, ty)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lvl = cell_level(cell)
    x, y = morton_decode(cell & np.uint64((1 << 58) - 1))
    return lvl, x.astype(np.int64), y.astype(np.int64)


def cell_parent(cell, parent_level: int) -> np.ndarray:
    """Level-`parent_level` ancestor — a pure bit shift (prefix property)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lvl = cell_level(cell)
    shift = (np.uint64(2) * (lvl.astype(np.uint64) - np.uint64(parent_level)))
    code = (cell & np.uint64((1 << 58) - 1)) >> shift
    return (np.uint64(parent_level) << np.uint64(58)) | code


def hilbert_from_tile(tx, ty, order: int) -> np.ndarray:
    """Hilbert-curve distance of tile (tx, ty) on the 2^order grid —
    the reference's spatial-sort key (`gdal vector sort --method
    hilbert`, apps/gdalalg_vector_sort.cpp:351-375).  Vectorized
    xy→d (iterative rotate-and-accumulate); like the Morton cell id it
    is a space-filling-curve key, with strictly better locality
    (consecutive keys are always grid neighbors)."""
    x = np.array(tx, dtype=np.int64, copy=True).reshape(-1)
    y = np.array(ty, dtype=np.int64, copy=True).reshape(-1)
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = (np.where(swap, y_f, x_f), np.where(swap, x_f, y_f))
        s >>= 1
    return d


def lonlat_to_hilbert(lon, lat, order: int) -> np.ndarray:
    tx, ty = tiles.lonlat_to_tile(lon, lat, order, convention="xyz")
    return hilbert_from_tile(tx, ty, order)


def cells_covering_bbox(min_lon, min_lat, max_lon, max_lat, level) -> np.ndarray:
    """All cell ids at `level` whose tile intersects the lon/lat bbox —
    the candidate-pruning covering used by the spatial join (the analog
    of the reference's envelope pre-filter, ogr/ogrlayer.cpp:5465-5487)."""
    tx0, ty0 = tiles.lonlat_to_tile(min_lon, min_lat, level, "xyz")
    tx1, ty1 = tiles.lonlat_to_tile(max_lon, max_lat, level, "xyz")
    x0, x1 = int(min(tx0, tx1)), int(max(tx0, tx1))
    y0, y1 = int(min(ty0, ty1)), int(max(ty0, ty1))
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return tile_to_cell(xs.ravel(), ys.ravel(), level)
