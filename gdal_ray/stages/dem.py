"""gdaldem terrain products over the tile table.

The reference's DEM processing (apps/gdaldem_lib.cpp) is a single
scanline pass applying a per-pixel 3x3-window function; on the tile
table it is exactly a halo-1 focal exchange (stages/focal.py): every
tile fetches a one-pixel apron from its 8 neighbors, then the window
function runs vectorized over the padded grid.

Conventions (documented, and restated identically in the SQL oracles):
- "Elevation" is the uint16 count grid; the mosaic is implicitly
  zero-padded beyond the tile set (as all focal ops here assume), so
  there are no edge pixels — the reference's -compute_edges border
  handling does not arise.
- Unit north-up geotransform: ewres = 1, nsres = -1, z = 1,
  xscale = yscale = 1 (gdaldem on a pixel grid).

Window layout matches the reference's afWin: afWin[k] is the value at
(col + k%3 - 1, row + k//3 - 1) — rows top to bottom, cols left to
right.

Products (all Horn-gradient; gdaldem_lib.cpp references):
- hillshade (GDALHillshadeAlg, :1016-1038 + constants :1184): the
  algebraic one-sqrt form; cang_mul_254 <= 0 -> 1.0 else
  1 + cang_mul_254.  Defaults az = 315, alt = 45.
- slope degrees / percent (GDALSlopeHornAlg, :1366-1386).
- aspect as azimuth (GDALAspectAlg, :1440-1480): atan2(dy, -dx)
  degrees, flat (dx = dy = 0) -> -9999, azimuth transform
  (>90 -> 450-a else 90-a), 360 -> 0.
- TRI Riley / Wilson (:2316-2345), TPI (:2352-2360), roughness
  (:2367-2389).
- color_relief (GDALColorRelief interpolation, :1640-1795): piecewise
  linear ramp, half-up int rounding, clamp-to-end colors outside the
  table, exact-entry short-circuit.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .focal import TILE, focal_map

# Window-slot offsets: afWin[k] at (dx, dy) = (k%3 - 1, k//3 - 1).
_SLOTS = [(k % 3 - 1, k // 3 - 1) for k in range(9)]


def _win(pad: np.ndarray, halo: int):
    """The 9 shifted (256, 256) views of the padded grid, float64."""
    w = []
    for dx, dy in _SLOTS:
        w.append(pad[halo + dy:halo + dy + TILE,
                     halo + dx:halo + dx + TILE].astype(np.float64))
    return w


def _horn_xy(w):
    """Horn gradient numerators (before the resolution division):
    x uses inv_ewres = +1, y uses inv_nsres = -1 (north-up)."""
    x = (w[0] + 2.0 * w[3] + w[6]) - (w[2] + 2.0 * w[5] + w[8])
    y = -((w[6] + 2.0 * w[7] + w[8]) - (w[0] + 2.0 * w[1] + w[2]))
    return x, y


def hillshade_kernel(az: float = 315.0, alt: float = 45.0):
    """GDALHillshadeAlg with z=1, scale=1, |res|=1: the exact algebra
    of gdaldem_lib.cpp:1016 — one sqrt, no trig per pixel."""
    azr = np.radians(float(az))
    altr = np.radians(float(alt))
    zf = 1.0 / 8.0                       # z_factor = z / 8 (Horn)
    sin_alt_254 = 254.0 * np.sin(altr)
    cos_az_cos_alt_z_254 = 254.0 * np.cos(azr) * np.cos(altr) * zf
    sin_az_cos_alt_z_254 = 254.0 * np.sin(azr) * np.cos(altr) * zf
    sq_z = zf * zf

    def kernel(pad: np.ndarray, halo: int) -> np.ndarray:
        w = _win(pad, halo)
        x, y = _horn_xy(w)
        xx_plus_yy = x * x + y * y
        cang254 = (sin_alt_254
                   - (y * cos_az_cos_alt_z_254
                      - x * sin_az_cos_alt_z_254)) \
            / np.sqrt(1.0 + sq_z * xx_plus_yy)
        return np.where(cang254 <= 0.0, 1.0, 1.0 + cang254)
    return kernel


def slope_aspect_kernel():
    """Planes [slope_degrees, slope_percent, aspect_azimuth]
    (GDALSlopeHornAlg slopeFormat 1/0 + GDALAspectAlg azimuth)."""
    def kernel(pad: np.ndarray, halo: int):
        w = _win(pad, halo)
        x, y = _horn_xy(w)
        key = x * x + y * y
        slope_deg = np.degrees(np.arctan(np.sqrt(key) / 8.0))
        slope_pct = (100.0 / 8.0) * np.sqrt(key)
        # Aspect gradient: no resolution factors (gdaldem_lib.cpp:1447)
        dxa = (w[2] + 2.0 * w[5] + w[8]) - (w[0] + 2.0 * w[3] + w[6])
        dya = (w[6] + 2.0 * w[7] + w[8]) - (w[0] + 2.0 * w[1] + w[2])
        asp = np.degrees(np.arctan2(dya, -dxa))
        asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
        asp = np.where(asp == 360.0, 0.0, asp)
        flat = (dxa == 0.0) & (dya == 0.0)
        asp = np.where(flat, -9999.0, asp)
        return np.stack([slope_deg, slope_pct, asp])
    return kernel


def terrain_kernel():
    """Planes [tri_riley, tri_wilson, tpi, roughness]."""
    def kernel(pad: np.ndarray, halo: int):
        w = _win(pad, halo)
        c = w[4]
        sq = np.zeros_like(c)
        ab = np.zeros_like(c)
        for k in (0, 1, 2, 3, 5, 6, 7, 8):
            d = w[k] - c
            sq += d * d
            ab += np.abs(d)
        tri_riley = np.sqrt(sq)
        tri_wilson = ab * 0.125
        tpi = c - (w[0] + w[1] + w[2] + w[3]
                   + w[5] + w[6] + w[7] + w[8]) * 0.125
        rough = np.maximum.reduce(w) - np.minimum.reduce(w)
        return np.stack([tri_riley, tri_wilson, tpi, rough])
    return kernel


def hillshade(tiles_ds, az: float = 315.0, alt: float = 45.0):
    return focal_map(tiles_ds, 1, hillshade_kernel(az, alt),
                     out_col="hillshade")


def slope_aspect(tiles_ds):
    return focal_map(tiles_ds, 1, slope_aspect_kernel(),
                     out_col=["slope_deg", "slope_pct", "aspect"])


def terrain_indices(tiles_ds):
    return focal_map(tiles_ds, 1, terrain_kernel(),
                     out_col=["tri_riley", "tri_wilson", "tpi",
                              "roughness"])


# --- color relief (pointwise; no halo) --------------------------------------

def _interp_channel(vals: np.ndarray, bps: np.ndarray,
                    ch: np.ndarray) -> np.ndarray:
    """GDALColorReliefGetRGBA, interpolation mode: below-first /
    above-last clamp to the end colors, exact match takes the entry,
    otherwise linear interpolation with half-up int rounding
    (int(0.5 + before + ratio * (after - before)), clamp 0..255)."""
    idx = np.searchsorted(bps, vals, side="left")
    out = np.empty(vals.shape, dtype=np.float64)
    below = idx == 0
    above = idx == len(bps)
    out[below] = ch[0]
    out[above] = ch[-1]
    mid = ~(below | above)
    i = idx[mid]
    v = vals[mid]
    exact = bps[i] == v
    lo, hi = i - 1, i
    ratio = (v - bps[lo]) / (bps[hi] - bps[lo])
    interp = np.floor(0.5 + ch[lo] + ratio * (ch[hi] - ch[lo]))
    out[mid] = np.where(exact, ch[i], interp)
    return np.clip(out, 0.0, 255.0)


def color_relief_batch(ramp):
    """ramp: sequence of (value, r, g, b) sorted by value.  Per tile
    emits three zlib'd uint8 256x256 grids (r, g, b)."""
    bps = np.asarray([e[0] for e in ramp], dtype=np.float64)
    chans = [np.asarray([e[j] for e in ramp], dtype=np.float64)
             for j in (1, 2, 3)]

    def fn(batch: pa.Table) -> pa.Table:
        outs = {"r": [], "g": [], "b": []}
        for blob in batch["raster"].to_pylist():
            g = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
                .reshape(TILE, TILE).astype(np.float64)
            for name, ch in zip(("r", "g", "b"), chans):
                plane = _interp_channel(g.ravel(), bps, ch) \
                    .astype(np.uint8).reshape(TILE, TILE)
                outs[name].append(zlib.compress(plane.tobytes(), 6))
        return pa.table({
            "z": batch["z"], "x": batch["x"], "y": batch["y"],
            "r": pa.array(outs["r"], pa.binary()),
            "g": pa.array(outs["g"], pa.binary()),
            "b": pa.array(outs["b"], pa.binary()),
        })
    return fn


def color_relief(tiles_ds, ramp):
    return tiles_ds.map_batches(color_relief_batch(ramp),
                                batch_format="pyarrow")
