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


def zt_kernel(az: float = 315.0, alt: float = 45.0):
    """Zevenbergen–Thorne gradient family (gdaldem -alg
    ZevenbergenThorne): planes [slope_deg, aspect, hillshade].
    Gradient is the 2-point stencil (afWin[3]-afWin[5], afWin[7]-
    afWin[1]) with z_factor = z/2 (gdaldem_lib.cpp:798-805, 1191);
    aspect uses (afWin[5]-afWin[3], afWin[7]-afWin[1]) (:1490);
    hillshade is the same one-sqrt algebra as Horn with the ZT
    gradient and zf = 1/2."""
    azr = np.radians(float(az))
    altr = np.radians(float(alt))
    zf = 1.0 / 2.0
    sin_alt_254 = 254.0 * np.sin(altr)
    cos_az_cos_alt_z_254 = 254.0 * np.cos(azr) * np.cos(altr) * zf
    sin_az_cos_alt_z_254 = 254.0 * np.sin(azr) * np.cos(altr) * zf
    sq_z = zf * zf

    def kernel(pad: np.ndarray, halo: int):
        w = _win(pad, halo)
        x = w[3] - w[5]                       # inv_ewres = +1
        y = -(w[7] - w[1])                    # inv_nsres = -1
        key = x * x + y * y
        slope_deg = np.degrees(np.arctan(np.sqrt(key) * 0.5))
        dxa = w[5] - w[3]
        dya = w[7] - w[1]
        asp = np.degrees(np.arctan2(dya, -dxa))
        asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
        asp = np.where(asp == 360.0, 0.0, asp)
        asp = np.where((dxa == 0.0) & (dya == 0.0), -9999.0, asp)
        cang254 = (sin_alt_254
                   - (y * cos_az_cos_alt_z_254
                      - x * sin_az_cos_alt_z_254)) \
            / np.sqrt(1.0 + sq_z * key)
        shade = np.where(cang254 <= 0.0, 1.0, 1.0 + cang254)
        return np.stack([slope_deg, asp, shade])
    return kernel


def zt_products(tiles_ds, az: float = 315.0, alt: float = 45.0):
    return focal_map(tiles_ds, 1, zt_kernel(az, alt),
                     out_col=["slope_deg", "aspect", "hillshade"])


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


def hillshade_variants_kernel(az: float = 315.0, alt: float = 45.0):
    """Planes [combined, multidirectional, igor] — the reference's
    -combined (GDALHillshadeCombinedAlg, gdaldem_lib.cpp:1151),
    -multidirectional (GDALHillshadeMultiDirectionalAlg, :1228,
    USGS OF 92-422 weights) and -igor (GDALHillshadeIgorAlg, :948)
    modes, unit north-up geotransform.  The acos argument is clipped
    to [-1, 1] on both engine and oracle sides (the reference would
    NaN at an exact sun/normal alignment ulp over 1)."""
    azr = np.radians(float(az))
    altr = np.radians(float(alt))
    zf = 1.0 / 8.0
    sin_alt = np.sin(altr)
    cos_az_cos_alt_z = np.cos(azr) * np.cos(altr) * zf
    sin_az_cos_alt_z = np.sin(azr) * np.cos(altr) * zf
    sq_z = zf * zf
    inv_sq_half_pi = 1.0 / ((np.pi * np.pi) / 4.0)
    # multidirectional constants (az-independent; alt only)
    sin_alt_127 = 127.0 * sin_alt
    cos_alt_z = np.cos(altr) * zf
    cos_alt_z_127 = 127.0 * cos_alt_z
    cos225_cos_alt_z_127 = 127.0 * np.cos(np.radians(225.0)) * cos_alt_z
    two_pi = 2.0 * np.pi

    def kernel(pad: np.ndarray, halo: int):
        w = _win(pad, halo)
        x, y = _horn_xy(w)
        xx = x * x
        yy = y * y
        xx_plus_yy = xx + yy
        flat = xx_plus_yy == 0.0

        # combined: 1 - acos(cang) * atan(sqrt(slope)) / (pi/2)^2
        slope = xx_plus_yy * sq_z
        num = sin_alt - (y * cos_az_cos_alt_z - x * sin_az_cos_alt_z)
        arg = np.clip(num / np.sqrt(1.0 + slope), -1.0, 1.0)
        cang = 1.0 - np.arccos(arg) * np.arctan(np.sqrt(slope)) \
            * inv_sq_half_pi
        combined = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)

        # multidirectional: USGS sin^2 weights over az 225/270/315/360
        v225 = np.maximum(sin_alt_127
                          + (x - y) * cos225_cos_alt_z_127, 0.0)
        v270 = np.maximum(sin_alt_127 - x * cos_alt_z_127, 0.0)
        v315 = np.maximum(sin_alt_127
                          + (x + y) * cos225_cos_alt_z_127, 0.0)
        v360 = np.maximum(sin_alt_127 - y * cos_alt_z_127, 0.0)
        w225 = 0.5 * xx_plus_yy - x * y
        w270 = xx
        w315 = xx_plus_yy - w225
        w360 = yy
        denom = np.where(flat, 1.0, xx_plus_yy)
        md = 1.0 + ((w225 * v225 + w270 * v270 + w315 * v315
                     + w360 * v360) / denom) \
            / np.sqrt(1.0 + sq_z * xx_plus_yy)
        multidir = np.where(flat, 1.0 + 254.0 * sin_alt, md)

        # igor: shadowness from slope and aspect-vs-sun strengths
        slope_deg = np.degrees(np.arctan(np.sqrt(xx_plus_yy) * zf))
        dxa = (w[2] + 2.0 * w[5] + w[8]) - (w[0] + 2.0 * w[3] + w[6])
        dya = (w[6] + 2.0 * w[7] + w[8]) - (w[0] + 2.0 * w[1] + w[2])
        aspect = np.arctan2(dya, -dxa)
        a2 = 1.5 * np.pi - azr
        na1 = np.where(aspect < 0.0, aspect + two_pi, aspect)
        na2 = np.fmod(a2, two_pi)
        na2 = na2 + two_pi if na2 < 0.0 else na2
        diff = np.abs(na1 - na2)
        diff = np.where(diff > np.pi, two_pi - diff, diff)
        aspect_strength = 1.0 - diff * (1.0 / np.pi)
        igor = 255.0 * (1.0 - (slope_deg * (1.0 / 90.0))
                        * aspect_strength)

        return np.stack([combined, multidir, igor])
    return kernel


def hillshade_variants(tiles_ds, az: float = 315.0, alt: float = 45.0):
    return focal_map(tiles_ds, 1, hillshade_variants_kernel(az, alt),
                     out_col=["combined", "multidir", "igor"])


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
