"""gdal_viewshed over the tile table (alg/viewshed/, Wang et al. 2000
"Generating viewsheds without using sightlines").

The reference sweeps the raster line by line away from the observer,
propagating for every cell the minimum height required for visibility
from its already-processed neighbors (viewshed_executor.cpp):

- axis cells: CalcHeightLine (:61) — Za * n / (n-1);
- exact diagonal cells: CalcHeightLine through the diagonal neighbor;
- interior cells, cell_mode "edge" (the default): CalcHeightEdge (:94)
  through the (prev-line, prev-col)/(same-line or same-col) pair,
  split on nXOffset >= nYOffset (doEdge, :106);
- "diagonal": CalcHeightDiagonal (:85); "min"/"max": the min/max of
  both (doMin/doMax, :115).
A cell is visible when its adjusted height + target_height reaches the
required height; the stored height becomes max(actual, required)
(setOutputNormal, :228).  Heights are adjusted by subtracting the
observer height DEM[obs] + observer_z (adjustHeight, :353, with the
curvature coefficient 0 — flat earth, unit grid).

Ray decomposition: observers are INDEPENDENT, so the parallel axis is
the observer — each tile emits its overlap with every observer's
(2R+1)² window, one hash exchange groups windows per observer, and the
sequential Wang sweep (inherently a per-pixel recurrence along each
line) runs per observer on the assembled window.  The mosaic is
implicitly zero-padded beyond the tile set, as all raster ops here
assume; pixels farther than max_dist (center distance, pixel units)
take out_of_range_val.  At 100 TB scale the window stays O(R²) per
observer regardless of raster size.

Output values follow the CLI defaults: visible 255, invisible 0,
out-of-range 0 (stored as distinct planes so counts stay exact).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

TILE = 256

_MODES = ("edge", "diagonal", "min", "max")


def _required_height(i, j, z, p10, p01, p11, mode):
    """Minimum visible height for quadrant-local cell (i, j) given the
    cumulative heights of its parents: p10 = zc(i-1, j), p01 =
    zc(i, j-1), p11 = zc(i-1, j-1).  Mirrors the reference's per-cell
    dispatch exactly (processLine/processFirstLine*)."""
    if j == 0:
        return z if i == 1 else p10 * i / (i - 1)
    if i == 0:
        return z if j == 1 else p01 * j / (j - 1)
    if i == j:
        return z if j == 1 else p11 * j / (j - 1)
    if mode == "edge":
        if i >= j:
            return (p11 * j + p10 * (i - j)) / (i - 1)
        return (p11 * i + p01 * (j - i)) / (j - 1)
    if mode == "diagonal":
        return (p10 * i + p01 * j) / (i + j - 1)
    e = (p11 * j + p10 * (i - j)) / (i - 1) if i >= j \
        else (p11 * i + p01 * (j - i)) / (j - 1)
    d = (p10 * i + p01 * j) / (i + j - 1)
    return min(e, d) if mode == "min" else max(e, d)


def viewshed_window(window: np.ndarray, max_dist: int,
                    observer_z: float = 2.0, target_height: float = 0.0,
                    mode: str = "edge",
                    height_adj: float = 0.0) -> np.ndarray:
    """Wang sweep over a (2R+1)² window centered on the observer.
    Returns uint8: 255 visible, 0 invisible, 0 out-of-range.
    ``height_adj`` is the earth-curvature coefficient: adjustHeight
    (viewshed_executor.cpp:353) subtracts height_adj · R² from each
    cell (the -cc curvature correction, unit grid)."""
    if mode not in _MODES:
        raise ValueError(f"cell mode must be one of {_MODES}")
    R = max_dist
    n = 2 * R + 1
    if window.shape != (n, n):
        raise ValueError(f"window must be {n}x{n}, got {window.shape}")
    z_obs = float(window[R, R]) + observer_z
    dy, dx = np.mgrid[-R:R + 1, -R:R + 1]
    r2 = (dx * dx + dy * dy).astype(np.float64)
    zadj = window.astype(np.float64) - (height_adj * r2 + z_obs)
    vis = np.zeros((n, n), dtype=np.uint8)
    max2 = float(max_dist) * float(max_dist)
    # per-quadrant cumulative heights, quadrant-local (i, j) indexing
    for sx, sy in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        zc = np.zeros((R + 1, R + 1))
        zc[0, 0] = -observer_z
        for d in range(1, 2 * R + 1):
            for i in range(max(0, d - R), min(d, R) + 1):
                j = d - i
                if i * i + j * j > max2:
                    continue
                z = zadj[R + sy * j, R + sx * i]
                req = _required_height(
                    i, j, z,
                    zc[i - 1, j] if i >= 1 else 0.0,
                    zc[i, j - 1] if j >= 1 else 0.0,
                    zc[i - 1, j - 1] if i >= 1 and j >= 1 else 0.0,
                    mode)
                if z + target_height >= req:
                    vis[R + sy * j, R + sx * i] = 255
                zc[i, j] = max(z, req)
    vis[R, R] = 255
    return vis


def _viewshed_runner(max_dist, observer_z, target_height, mode,
                     height_adj=0.0):
    """Per-observer window assembly + sweep (one group per observer
    after the hash exchange)."""
    R = int(max_dist)

    def run_group(g: pa.Table) -> pa.Table:
        n = 2 * R + 1
        window = np.zeros((n, n), dtype=np.int64)
        gx = int(g["ogx"][0].as_py())
        gy = int(g["ogy"][0].as_py())
        obs = int(g["obs_id"][0].as_py())
        for r0, c0, h, w, band in zip(g["r0"].to_pylist(),
                                      g["c0"].to_pylist(),
                                      g["h"].to_pylist(),
                                      g["w"].to_pylist(),
                                      g["band"].to_pylist()):
            sub = np.frombuffer(band, dtype=np.uint16).reshape(h, w)
            window[r0:r0 + h, c0:c0 + w] = sub
        vis = viewshed_window(window, R, observer_z, target_height,
                              mode, height_adj)
        return pa.table({
            "obs_id": pa.array([obs], pa.int64()),
            "gx": pa.array([gx], pa.int64()),
            "gy": pa.array([gy], pa.int64()),
            "visible": pa.array([zlib.compress(vis.tobytes(), 6)],
                                pa.binary()),
        })
    return run_group


def viewshed(tiles_ds, observers, max_dist: int,
             observer_z: float = 2.0, target_height: float = 0.0,
             mode: str = "edge", height_adj: float = 0.0):
    """Distributed gdal_viewshed: ``observers`` is a list of
    (obs_id, gx, gy) global-pixel coordinates at the tile mosaic's
    z+8 pixel grid.  Each observer yields one row (obs_id, gx, gy,
    visible-uint8-grid).  Tiles overlapping no window are pruned at
    the emit stage; missing tiles inside a window are zero terrain."""
    if mode not in _MODES:
        raise ValueError(f"cell mode must be one of {_MODES}")
    R = int(max_dist)
    obs_list = [(int(o), int(x), int(y)) for o, x, y in observers]

    def emit(batch: pa.Table) -> pa.Table:
        out = {"obs_id": [], "ogx": [], "ogy": [], "r0": [], "c0": [],
               "h": [], "w": [], "band": []}
        n = 2 * R + 1
        for z, x, y, blob in zip(batch["z"].to_pylist(),
                                 batch["x"].to_pylist(),
                                 batch["y"].to_pylist(),
                                 batch["raster"].to_pylist()):
            tx0, ty0 = int(x) * TILE, int(y) * TILE
            g = None
            for obs, ogx, ogy in obs_list:
                wx0, wy0 = ogx - R, ogy - R
                cs0 = max(tx0, wx0) - tx0
                rs0 = max(ty0, wy0) - ty0
                cs1 = min(tx0 + TILE, wx0 + n) - tx0
                rs1 = min(ty0 + TILE, wy0 + n) - ty0
                if cs1 <= cs0 or rs1 <= rs0:
                    continue
                if g is None:
                    g = np.frombuffer(zlib.decompress(blob),
                                      dtype=">u2").reshape(TILE, TILE)
                sub = np.ascontiguousarray(
                    g[rs0:rs1, cs0:cs1]).astype(np.uint16)
                out["obs_id"].append(obs)
                out["ogx"].append(ogx)
                out["ogy"].append(ogy)
                out["r0"].append(ty0 + rs0 - wy0)
                out["c0"].append(tx0 + cs0 - wx0)
                out["h"].append(sub.shape[0])
                out["w"].append(sub.shape[1])
                out["band"].append(sub.tobytes())
        return pa.table({
            "obs_id": pa.array(out["obs_id"], pa.int64()),
            "ogx": pa.array(out["ogx"], pa.int64()),
            "ogy": pa.array(out["ogy"], pa.int64()),
            "r0": pa.array(out["r0"], pa.int32()),
            "c0": pa.array(out["c0"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "w": pa.array(out["w"], pa.int32()),
            "band": pa.array(out["band"], pa.binary()),
        })

    emitted = tiles_ds.map_batches(emit, batch_format="pyarrow")
    runner = _viewshed_runner(R, observer_z, target_height, mode,
                              height_adj)
    return emitted.groupby("obs_id").map_groups(runner,
                                                batch_format="pyarrow")
