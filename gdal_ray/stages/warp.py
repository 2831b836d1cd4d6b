"""Raster warp — reproject the web-mercator tile mosaic to a
plate-carrée (EPSG:4326 equirectangular) tile grid.

The reference's warp (alg/gdalwarpoperation.cpp:1043
ChunkAndWarpImage) processes the OUTPUT in chunks, computing for each
chunk the source window it needs and resampling.  Re-expressed on the
tile table:

1. each SOURCE mercator tile computes which output (plate-carrée)
   tiles its lat/lon footprint overlaps and emits itself to those keys
   — the inverse of the reference's per-chunk source-window
   computation, same dataflow as one hash-bucketed exchange;
2. per OUTPUT tile: assemble the received source grids and resample
   every output pixel by nearest neighbor (GRA_NearestNeighbour, the
   reference default): output pixel center (lon, lat) → global
   mercator pixel via the SAME direct slippy formula as the rest of
   the engine (geom.tiles.global_pixel) → source tile + offset, one
   vectorized gather per source tile.

Output grid: at source zoom z the destination is a 2^z × 2^z tile grid
over lon ∈ [-180, 180], lat ∈ [90, -90] (rows north→south), each tile
256×256 px — i.e. square degrees-per-pixel in lon, half resolution in
lat (plate carrée).  Pixels whose mercator source pixel is outside any
source tile are 0 (the mosaic's implicit zero padding); |lat| beyond
the web-mercator square is 0 too.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..geom import tiles as _tiles

TILE = 256


def _dest_key(xo, yo):
    return (np.int64(xo) << 28) | np.int64(yo)


def _merc_lat_range(y: int, z: int) -> tuple[float, float]:
    """Latitude span (south, north) of XYZ mercator tile row y."""
    n = 1 << z

    def lat_of(yy):
        t = np.pi * (1.0 - 2.0 * yy / n)
        return float(np.degrees(np.arctan(np.sinh(t))))

    return lat_of(y + 1), lat_of(y)


def _lat_of_gp(gp: float, z: int) -> float:
    """Latitude of CONTINUOUS global mercator pixel row gp at zoom z
    (row 0 at the north edge); inverse of the slippy y formula."""
    npix = 256 << z
    t = np.pi * (1.0 - 2.0 * gp / npix)
    return float(np.degrees(np.arctan(np.sinh(t))))


def emit_to_dest(batch: pa.Table, halo: float = 0.0) -> pa.Table:
    """Source mercator tile → one row per overlapped output tile.

    ``halo`` expands the source footprint by that many source pixel
    rows on each side: a dest pixel center at continuous global row gpy
    reads rows floor(gpy-0.5)±(taps), so it touches tile row sy iff
    gpy ∈ [sy·256-halo, (sy+1)·256+halo) — 0.5 for bilinear (2 taps),
    1.5 for cubic (4 taps).  The lon direction needs no halo: the dest
    lon grid aligns exactly with the source columns at equal zoom
    (wx ≡ 0, see _warp_one_bilinear)."""
    keys, zs, xs, ys, blobs = [], [], [], [], []
    for z, x, y, blob in zip(batch["z"].to_pylist(), batch["x"].to_pylist(),
                             batch["y"].to_pylist(),
                             batch["raster"].to_pylist()):
        z, x, y = int(z), int(x), int(y)
        n = 1 << z
        lon0 = -180.0 + x * 360.0 / n
        lon1 = lon0 + 360.0 / n
        if halo:
            lat_n = _lat_of_gp(y * 256 - halo, z)
            lat_s = _lat_of_gp((y + 1) * 256 + halo, z)
        else:
            lat_s, lat_n = _merc_lat_range(y, z)
        # overlapped output tiles: lon cols are 360/2^z wide (== same
        # x range); lat rows are 180/2^z tall, row 0 at +90
        xo = x  # same lon split
        row_h = 180.0 / n
        yo0 = int(np.floor((90.0 - lat_n) / row_h))
        yo1 = int(np.floor((90.0 - lat_s) / row_h - 1e-12))
        for yo in range(max(0, yo0), min(n - 1, yo1) + 1):
            keys.append(int(_dest_key(xo, yo)))
            zs.append(z)
            xs.append(x)
            ys.append(y)
            blobs.append(blob)
    return pa.table({
        "dest": pa.array(keys, pa.int64()),
        "z": pa.array(zs, pa.int32()),
        "sx": pa.array(xs, pa.int64()),
        "sy": pa.array(ys, pa.int64()),
        "raster": pa.array(blobs, pa.binary()),
    })


def _warp_one(z: int, xo: int, yo: int, grids: dict) -> np.ndarray:
    """Resample one output tile by nearest neighbor."""
    n = 1 << z
    lon = -180.0 + (xo + (np.arange(TILE) + 0.5) / TILE) * 360.0 / n
    lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / n
    lon2 = np.repeat(lon[None, :], TILE, axis=0).ravel()
    lat2 = np.repeat(lat[:, None], TILE, axis=1).ravel()
    inside = np.abs(lat2) <= _tiles.MAX_LATITUDE
    out = np.zeros(TILE * TILE, dtype=np.int64)
    if inside.any():
        gx, gy = _tiles.global_pixel(lon2[inside], lat2[inside], z)
        key = (gx >> 8 << 32) | (gy >> 8)
        col = gx & 255
        row = gy & 255
        vals = np.zeros(len(gx), dtype=np.int64)
        order = np.argsort(key, kind="stable")
        uniq, starts = np.unique(key[order], return_index=True)
        bounds = np.append(starts, len(key))
        for j in range(len(uniq)):
            g = grids.get((int(uniq[j] >> 32), int(uniq[j] & 0xFFFFFFFF)))
            if g is not None:
                idx = order[bounds[j]:bounds[j + 1]]
                vals[idx] = g[row[idx], col[idx]]
        out[inside] = vals
    return out.reshape(TILE, TILE)


def _gather(grids: dict, gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Vectorized lookup of global pixels (gx, gy) in the shipped source
    tile dict {(tx, ty): 256×256 int64}; pixels in tiles not present in
    the mosaic read 0 (the mosaic's implicit zero padding)."""
    key = (gx >> 8 << 32) | (gy >> 8)
    vals = np.zeros(len(gx), dtype=np.float64)
    order = np.argsort(key, kind="stable")
    uniq, starts = np.unique(key[order], return_index=True)
    bounds = np.append(starts, len(key))
    col = gx & 255
    row = gy & 255
    for j in range(len(uniq)):
        g = grids.get((int(uniq[j] >> 32), int(uniq[j] & 0xFFFFFFFF)))
        if g is not None:
            idx = order[bounds[j]:bounds[j + 1]]
            vals[idx] = g[row[idx], col[idx]]
    return vals


def _warp_one_bilinear(z: int, xo: int, yo: int, grids: dict) -> np.ndarray:
    """Resample one output tile by bilinear interpolation
    (GRA_Bilinear, alg/gdalresamplingkernels.h:1): the output pixel
    center maps to a CONTINUOUS source pixel position; the four
    surrounding source pixel centers are gathered and lerped.  Source
    coordinates clamp at the global grid edge (edge replication).

    At equal source/dest zoom the dest lon grid coincides with the
    source columns — gpx-0.5 is exactly integral (all quantities are
    dyadic rationals, exact in IEEE double), so wx ≡ 0 and only the
    latitude direction interpolates.  Returns float64 (continuous
    values; the caller quantizes)."""
    n = 1 << z
    npix = n * TILE
    lon = -180.0 + (xo + (np.arange(TILE) + 0.5) / TILE) * 360.0 / n
    lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / n
    lon2 = np.repeat(lon[None, :], TILE, axis=0).ravel()
    lat2 = np.repeat(lat[:, None], TILE, axis=1).ravel()
    inside = np.abs(lat2) <= _tiles.MAX_LATITUDE
    out = np.zeros(TILE * TILE, dtype=np.float64)
    if inside.any():
        li, ai = lon2[inside], lat2[inside]
        gpx = (li + 180.0) / 360.0 * npix
        r = np.radians(ai)
        gpy = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * npix
        fx = gpx - 0.5
        fy = gpy - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        wx = fx - x0
        wy = fy - y0
        x1 = np.minimum(x0 + 1, npix - 1)
        y1 = np.minimum(y0 + 1, npix - 1)
        x0 = np.maximum(x0, 0)
        y0 = np.maximum(y0, 0)
        val = ((1.0 - wx) * (1.0 - wy) * _gather(grids, x0, y0)
               + wx * (1.0 - wy) * _gather(grids, x1, y0)
               + (1.0 - wx) * wy * _gather(grids, x0, y1)
               + wx * wy * _gather(grids, x1, y1))
        out[inside] = val
    return out.reshape(TILE, TILE)


def _cubic_w_near(d):
    """Catmull-Rom cubic kernel (a = −0.5), |d| ≤ 1 branch, Horner form
    shared verbatim with the SQL oracle (GWKCubicKernel,
    alg/gdalresamplingkernels.h:37)."""
    return (1.5 * d - 2.5) * d * d + 1.0


def _cubic_w_far(d):
    """Cubic kernel 1 < |d| ≤ 2 branch (same Horner form as the SQL)."""
    return ((-0.5 * d + 2.5) * d - 4.0) * d + 2.0


def _warp_one_cubic(z: int, xo: int, yo: int, grids: dict) -> np.ndarray:
    """Cubic-convolution resample (GRA_Cubic, Catmull-Rom a=−0.5): 4
    row taps at y0−1..y0+2 weighted by the cubic kernel; the column
    direction degenerates to the single aligned column (wx ≡ 0 ⇒
    weights (0,1,0,0) exactly — the kernel polynomials are exact at
    integer distances in IEEE arithmetic)."""
    n = 1 << z
    npix = n * TILE
    lon = -180.0 + (xo + (np.arange(TILE) + 0.5) / TILE) * 360.0 / n
    lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / n
    lon2 = np.repeat(lon[None, :], TILE, axis=0).ravel()
    lat2 = np.repeat(lat[:, None], TILE, axis=1).ravel()
    inside = np.abs(lat2) <= _tiles.MAX_LATITUDE
    out = np.zeros(TILE * TILE, dtype=np.float64)
    if inside.any():
        li, ai = lon2[inside], lat2[inside]
        gpx = (li + 180.0) / 360.0 * npix
        r = np.radians(ai)
        gpy = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * npix
        fx = gpx - 0.5
        fy = gpy - 0.5
        x0 = np.maximum(np.floor(fx).astype(np.int64), 0)
        y0 = np.floor(fy).astype(np.int64)
        wy = fy - y0
        w = (_cubic_w_far(1.0 + wy), _cubic_w_near(wy),
             _cubic_w_near(1.0 - wy), _cubic_w_far(2.0 - wy))
        val = np.zeros(inside.sum(), dtype=np.float64)
        for j in range(4):
            yj = np.clip(y0 - 1 + j, 0, npix - 1)
            val = val + w[j] * _gather(grids, x0, yj)
        out[inside] = val
    return out.reshape(TILE, TILE)


def _lanczos_w(d):
    """Lanczos a=3 kernel sinc(d)·sinc(d/3) (GWKLanczosSinc,
    alg/gdalresamplingkernels.h:74).  Exact-zero distance → 1 (the
    sinc limit); the expression order is shared verbatim with the SQL
    oracle so both engines compute bit-identical weights."""
    ds = np.where(d == 0.0, 1.0, d)
    w = (np.sin(np.pi * ds) / (np.pi * ds)
         * (np.sin(np.pi * ds / 3.0) / (np.pi * ds / 3.0)))
    return np.where(d == 0.0, 1.0, w)


def _warp_one_lanczos(z: int, xo: int, yo: int, grids: dict) -> np.ndarray:
    """Lanczos (a=3) resample: 6 row taps at y0−2..y0+3, weights
    normalized by their sum (GWKResample's dfAccumulatorWeight —
    lanczos weights don't sum to 1, unlike bilinear/cubic).  The
    aligned column direction contributes the analytic sinc zeros at
    integer distances, so only the center column is sampled."""
    n = 1 << z
    npix = n * TILE
    lon = -180.0 + (xo + (np.arange(TILE) + 0.5) / TILE) * 360.0 / n
    lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / n
    lon2 = np.repeat(lon[None, :], TILE, axis=0).ravel()
    lat2 = np.repeat(lat[:, None], TILE, axis=1).ravel()
    inside = np.abs(lat2) <= _tiles.MAX_LATITUDE
    out = np.zeros(TILE * TILE, dtype=np.float64)
    if inside.any():
        li, ai = lon2[inside], lat2[inside]
        gpx = (li + 180.0) / 360.0 * npix
        r = np.radians(ai)
        gpy = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * npix
        fx = gpx - 0.5
        fy = gpy - 0.5
        x0 = np.maximum(np.floor(fx).astype(np.int64), 0)
        y0 = np.floor(fy).astype(np.int64)
        wy = fy - y0
        val = np.zeros(inside.sum(), dtype=np.float64)
        wsum = np.zeros(inside.sum(), dtype=np.float64)
        for j in range(6):
            d = np.abs(wy + (2.0 - j))
            w = _lanczos_w(d)
            yj = np.clip(y0 - 2 + j, 0, npix - 1)
            val = val + w * _gather(grids, x0, yj)
            wsum = wsum + w
        out[inside] = val / wsum
    return out.reshape(TILE, TILE)


_RESAMPLERS = {
    "nearest": (_warp_one, 0.0),
    "bilinear": (_warp_one_bilinear, 0.5),
    "cubic": (_warp_one_cubic, 1.5),
    "lanczos": (_warp_one_lanczos, 2.5),
}


def warp_to_platecarree(tiles_ds, n_buckets: int | None = None,
                        resampling: str = "nearest"):
    """Mercator tile table → plate-carrée tile table; output y rows run
    north→south from lat +90.  resampling: "nearest" (GDAL default,
    uint16 raster out), "bilinear" or "cubic" (float32 ``raster_f32``
    out)."""
    from ._pool import cluster_cpus
    B = n_buckets or max(16, cluster_cpus() * 2)
    if resampling not in _RESAMPLERS:
        raise ValueError(f"unsupported resampling {resampling!r}")
    kernel, halo = _RESAMPLERS[resampling]
    float_kernel = resampling != "nearest"  # float32 output path

    emit = tiles_ds.map_batches(
        lambda b: emit_to_dest(b, halo=halo), batch_format="pyarrow")
    emit = emit.map_batches(
        lambda b: b.append_column(
            "bucket", pa.array((b["dest"].to_numpy(zero_copy_only=False)
                                % B).astype(np.int32))),
        batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        dest = g["dest"].to_numpy(zero_copy_only=False)
        order = np.argsort(dest, kind="stable")
        zz = g["z"].to_numpy(zero_copy_only=False)
        sx = g["sx"].to_numpy(zero_copy_only=False)
        sy = g["sy"].to_numpy(zero_copy_only=False)
        blobs = g["raster"].to_pylist()
        ds_ = dest[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        ends = np.r_[starts[1:], len(ds_)]
        out = {"z": [], "x": [], "y": [], "raster": []}
        for s, e in zip(starts, ends):
            rows = order[s:e]
            key = int(ds_[s])
            xo, yo = key >> 28, key & ((1 << 28) - 1)
            z = int(zz[rows[0]])
            grids = {}
            for r in rows:
                grids[(int(sx[r]), int(sy[r]))] = np.frombuffer(
                    zlib.decompress(blobs[r]), dtype=">u2") \
                    .reshape(TILE, TILE).astype(np.int64)
            if float_kernel:
                res = kernel(z, xo, yo, grids)
                blob = zlib.compress(
                    res.astype("<f4").tobytes(), 6)
            else:
                res = _warp_one(z, xo, yo, grids)
                blob = zlib.compress(
                    np.clip(res, 0, 65535).astype(">u2").tobytes(), 6)
            out["z"].append(z)
            out["x"].append(xo)
            out["y"].append(yo)
            out["raster"].append(blob)
        name = "raster_f32" if float_kernel else "raster"
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            name: pa.array(out["raster"], pa.binary()),
        })

    return emit.groupby("bucket").map_groups(per_bucket,
                                             batch_format="pyarrow")
