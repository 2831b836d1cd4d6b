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


# ---------------------------------------------------------------------------
# CRS-general warp: mercator mosaic → any registered destination CRS
# (the ChunkAndWarpImage generality, alg/gdalwarpoperation.cpp:1043 —
# the transformer is a parameter, not baked into the kernel)
# ---------------------------------------------------------------------------


def _resample2d(lon2, lat2, valid, z: int, grids: dict,
                resampling: str) -> np.ndarray:
    """Resample the mercator mosaic at arbitrary (lon, lat) sample
    positions — full 2-D kernels (unlike the plate-carrée fast paths
    above, a general destination grid has wx ≠ 0).  ``valid`` masks
    positions whose inverse transform failed; those and |lat| beyond
    the mercator square read 0 (gdalwarp's dfDstNoDataReal default)."""
    npix = (1 << z) * TILE
    inside = valid & np.isfinite(lat2) & \
        (np.abs(lat2) <= _tiles.MAX_LATITUDE)
    out = np.zeros(lon2.shape, dtype=np.float64)
    if not inside.any():
        return out
    li, ai = lon2[inside], lat2[inside]
    if resampling == "nearest":
        gx, gy = _tiles.global_pixel(li, ai, z)
        out[inside] = _gather(grids, gx, gy)
        return out
    gpx = (li + 180.0) / 360.0 * npix
    r = np.radians(ai)
    gpy = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * npix
    fx = gpx - 0.5
    fy = gpy - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = fx - x0
    wy = fy - y0
    if resampling == "bilinear":
        x1 = np.minimum(x0 + 1, npix - 1)
        y1 = np.minimum(y0 + 1, npix - 1)
        x0c = np.maximum(x0, 0)
        y0c = np.maximum(y0, 0)
        val = ((1.0 - wx) * (1.0 - wy) * _gather(grids, x0c, y0c)
               + wx * (1.0 - wy) * _gather(grids, x1, y0c)
               + (1.0 - wx) * wy * _gather(grids, x0c, y1)
               + wx * wy * _gather(grids, x1, y1))
    elif resampling == "cubic":
        wxs = (_cubic_w_far(1.0 + wx), _cubic_w_near(wx),
               _cubic_w_near(1.0 - wx), _cubic_w_far(2.0 - wx))
        wys = (_cubic_w_far(1.0 + wy), _cubic_w_near(wy),
               _cubic_w_near(1.0 - wy), _cubic_w_far(2.0 - wy))
        val = np.zeros(li.shape, dtype=np.float64)
        for jy in range(4):
            yj = np.clip(y0 - 1 + jy, 0, npix - 1)
            for jx in range(4):
                xj = np.clip(x0 - 1 + jx, 0, npix - 1)
                val = val + wys[jy] * wxs[jx] * _gather(grids, xj, yj)
    elif resampling == "lanczos":
        val = np.zeros(li.shape, dtype=np.float64)
        wsum = np.zeros(li.shape, dtype=np.float64)
        for jy in range(6):
            wyj = _lanczos_w(np.abs(wy + (2.0 - jy)))
            yj = np.clip(y0 - 2 + jy, 0, npix - 1)
            for jx in range(6):
                w = wyj * _lanczos_w(np.abs(wx + (2.0 - jx)))
                xj = np.clip(x0 - 2 + jx, 0, npix - 1)
                val = val + w * _gather(grids, xj, yj)
                wsum = wsum + w
        val = val / wsum
    else:
        raise ValueError(f"unsupported resampling {resampling!r}")
    out[inside] = val
    return out


_HALO2D = {"nearest": 0.0, "bilinear": 1.0, "cubic": 2.0, "lanczos": 3.0}


def build_routing_map(z: int, dst_crs, grid, resampling: str,
                      samples: int = 17) -> dict:
    """Driver-side dest→source coverage map: {(sx, sy): [dest keys]}.
    Each destination tile samples a ``samples×samples`` lattice of its
    pixel centers, inverse-projects to lon/lat, and takes the global
    mercator pixel bbox padded by the kernel halo plus one full source
    tile (lattice-curvature safety).  O(dest tiles · samples²) driver
    work, built once and broadcast — the same once-per-job pattern as
    the spatial-join index.  Over-shipping a border tile is benign
    (extra bytes); the SQL oracle catches any under-shipping as a
    value mismatch."""
    from ..geom.crs import Transformer

    x0, dx, y0, dy, width, height = grid
    if width % TILE or height % TILE:
        raise ValueError("dest grid width/height must be multiples of "
                         f"{TILE}")
    tr = Transformer.from_crs(dst_crs, 4326)
    npix = (1 << z) * TILE
    hp = _HALO2D[resampling] + 1.0
    offs = np.linspace(0.5, TILE - 0.5, samples)
    src2dest: dict = {}
    for tyo in range(height // TILE):
        for txo in range(width // TILE):
            X = x0 + (txo * TILE + offs) * dx
            Y = y0 + (tyo * TILE + offs) * dy
            XX, YY = np.meshgrid(X, Y)
            lon, lat, ok = tr.transform_with_errors(XX.ravel(),
                                                    YY.ravel())
            ok = ok & (np.abs(lat) <= _tiles.MAX_LATITUDE)
            if not ok.any():
                continue
            li, ai = lon[ok], lat[ok]
            gpx = (li + 180.0) / 360.0 * npix
            rr = np.radians(ai)
            gpy = (1.0 - np.log(np.tan(rr) + 1.0 / np.cos(rr))
                   / np.pi) / 2.0 * npix
            sx0 = max(0, int(np.floor(gpx.min() - hp)) // TILE - 1)
            sx1 = min((1 << z) - 1,
                      int(np.floor(gpx.max() + hp)) // TILE + 1)
            sy0 = max(0, int(np.floor(gpy.min() - hp)) // TILE - 1)
            sy1 = min((1 << z) - 1,
                      int(np.floor(gpy.max() + hp)) // TILE + 1)
            key = int(_dest_key(txo, tyo))
            for sy in range(sy0, sy1 + 1):
                for sx in range(sx0, sx1 + 1):
                    src2dest.setdefault((sx, sy), []).append(key)
    return src2dest


def warp_to_crs(tiles_ds, z: int, dst_crs, grid,
                resampling: str = "nearest", n_buckets: int | None = None):
    """Warp the zoom-``z`` mercator tile mosaic onto an arbitrary
    destination grid in any registered CRS (EPSG:4326/3857/UTM/Albers/
    LCC/polar stereographic or a PROJ-style dict — geom/crs.py).

    ``grid`` = (x0, dx, y0, dy, width, height) in destination CRS
    units, north-up (dy < 0), width/height multiples of 256.  Output:
    (tx, ty, raster|raster_f32) destination tiles — nearest keeps the
    uint16 payload, the float kernels emit float32, matching
    warp_to_platecarree's conventions."""
    import ray

    from ._pool import cluster_cpus

    B = n_buckets or max(16, cluster_cpus() * 2)
    if resampling not in _HALO2D:
        raise ValueError(f"unsupported resampling {resampling!r}")
    float_kernel = resampling != "nearest"
    x0, dx, y0, dy, width, height = grid

    routing = build_routing_map(z, dst_crs, grid, resampling)
    ref = ray.put(routing)

    def emit(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)  # broadcast map, local object-store fetch
        bx = batch["x"].to_numpy(zero_copy_only=False)
        by = batch["y"].to_numpy(zero_copy_only=False)
        blobs = batch["raster"].to_pylist()
        counts = [len(m.get((int(a), int(b)), ()))
                  for a, b in zip(bx, by)]
        keys = [key for a, b in zip(bx, by)
                for key in m.get((int(a), int(b)), ())]
        k = np.asarray(keys, np.int64)
        return pa.table({
            "dest": pa.array(k),
            "bucket": pa.array((k % B).astype(np.int32)),
            "sx": pa.array(np.repeat(bx, counts).astype(np.int64)),
            "sy": pa.array(np.repeat(by, counts).astype(np.int64)),
            "raster": pa.array(
                [b for b, c in zip(blobs, counts) for _ in range(c)],
                pa.binary()),
        })

    emitted = tiles_ds.map_batches(emit, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..geom.crs import Transformer
        tr = Transformer.from_crs(dst_crs, 4326)
        dest = g["dest"].to_numpy(zero_copy_only=False)
        order = np.argsort(dest, kind="stable")
        sx = g["sx"].to_numpy(zero_copy_only=False)
        sy = g["sy"].to_numpy(zero_copy_only=False)
        blobs = g["raster"].to_pylist()
        ds_ = dest[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        ends = np.r_[starts[1:], len(ds_)]
        cols = np.arange(TILE)
        out = {"tx": [], "ty": [], "raster": []}
        for s, e in zip(starts, ends):
            rows = order[s:e]
            key = int(ds_[s])
            txo, tyo = key >> 28, key & ((1 << 28) - 1)
            grids = {}
            for r in rows:
                grids[(int(sx[r]), int(sy[r]))] = np.frombuffer(
                    zlib.decompress(blobs[r]), dtype=">u2") \
                    .reshape(TILE, TILE).astype(np.int64)
            X = x0 + (txo * TILE + cols + 0.5) * dx
            Y = y0 + (tyo * TILE + cols + 0.5) * dy
            X2 = np.repeat(X[None, :], TILE, axis=0).ravel()
            Y2 = np.repeat(Y[:, None], TILE, axis=1).ravel()
            lon, lat, ok = tr.transform_with_errors(X2, Y2)
            res = _resample2d(lon, lat, ok, z, grids, resampling) \
                .reshape(TILE, TILE)
            if float_kernel:
                blob = zlib.compress(res.astype("<f4").tobytes(), 6)
            else:
                blob = zlib.compress(
                    np.clip(res, 0, 65535).astype(">u2").tobytes(), 6)
            out["tx"].append(txo)
            out["ty"].append(tyo)
            out["raster"].append(blob)
        name = "raster_f32" if float_kernel else "raster"
        return pa.table({
            "tx": pa.array(out["tx"], pa.int64()),
            "ty": pa.array(out["ty"], pa.int64()),
            name: pa.array(out["raster"], pa.binary()),
        })

    return emitted.groupby("bucket").map_groups(per_bucket,
                                                batch_format="pyarrow")


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
