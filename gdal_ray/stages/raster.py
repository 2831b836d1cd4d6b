"""Raster-side operators over the tile table.

A "raster" is a Dataset of tile rows (z, x, y, raster) where raster is
a zlib-compressed big-endian uint16 256x256 count grid (SURVEY.md §1.4:
the reference's band/block model lifted to rows; rendered by
stages.tiling.render_tile_group).

Operators:
- pixels_as_features: `gdal raster as-features` (apps/
  gdalalg_raster_as_features.cpp) — nonzero pixels as vector rows.
  Pixel (px,py) of XYZ tile (z,x,y) is EXACTLY tile (x*256+px, y*256+py)
  at zoom z+8 (verified in tests) — the identity the SQL oracle uses.
- value_at_points: GDALRasterInterpolateAtPoint semantics
  (alg/gdal_interpolateatpoint.cpp) — nearest / bilinear sampling of
  the tile table at lon/lat points; tile table broadcast once per actor.
- raster_calc: `gdal raster calc` — per-tile numpy expression.
- band_stats: GDALRasterBand::ComputeStatistics — per-tile partials,
  driver-side combine (count/sum/min/max/mean over all pixels).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray

from ..geom import tiles as _tiles
from ._pool import autoscale as _autoscale

TILE_SIZE = 256
N_PIX = TILE_SIZE * TILE_SIZE


def _decode_grid(blob: bytes) -> np.ndarray:
    raw = zlib.decompress(blob)
    if len(raw) != N_PIX * 2:
        raise ValueError(
            f"raster blob decodes to {len(raw)} bytes, expected "
            f"{N_PIX * 2} (>u2 256x256) — float rasters live in the "
            f"'raster_f32' column (raster_calc output), not 'raster'")
    return np.frombuffer(raw, dtype=">u2") \
        .reshape(TILE_SIZE, TILE_SIZE).astype(np.int64)


def pixels_as_features_batch(batch: pa.Table) -> pa.Table:
    """Explode each tile's nonzero pixels into rows (z,x,y,px,py,n)."""
    zs, xs, ys, pxs, pys, ns = [], [], [], [], [], []
    for z, x, y, blob in zip(batch["z"].to_pylist(),
                             batch["x"].to_pylist(),
                             batch["y"].to_pylist(),
                             batch["raster"].to_pylist()):
        grid = _decode_grid(blob)
        py, px = np.nonzero(grid)
        k = len(px)
        zs.append(np.full(k, z, dtype=np.int32))
        xs.append(np.full(k, x, dtype=np.int64))
        ys.append(np.full(k, y, dtype=np.int64))
        pxs.append(px.astype(np.int32))
        pys.append(py.astype(np.int32))
        ns.append(grid[py, px])
    cat = np.concatenate
    return pa.table({
        "z": pa.array(cat(zs) if zs else np.empty(0, np.int32)),
        "x": pa.array(cat(xs) if xs else np.empty(0, np.int64)),
        "y": pa.array(cat(ys) if ys else np.empty(0, np.int64)),
        "px": pa.array(cat(pxs) if pxs else np.empty(0, np.int32)),
        "py": pa.array(cat(pys) if pys else np.empty(0, np.int32)),
        "n": pa.array(cat(ns) if ns else np.empty(0, np.int64)),
    })


def pixels_as_features(tiles_ds):
    return tiles_ds.map_batches(pixels_as_features_batch,
                                batch_format="pyarrow")


class RasterSampler:
    """Actor callable: sample the broadcast tile table at point columns.

    method='nearest' → value of the containing pixel (0 where no tile);
    method='bilinear' → bilinear blend of the 4 pixel centers around the
    point (pixel center at +0.5; edge-clamped), the reference's default
    GRIORA_Bilinear behavior."""

    def __init__(self, tiles_ref, zoom: int, method: str = "nearest",
                 lon_col: str = "lon", lat_col: str = "lat",
                 out: str = "raster_value"):
        t = ray.get(tiles_ref) if isinstance(tiles_ref, ray.ObjectRef) \
            else tiles_ref
        self.grids = {
            (int(x), int(y)): _decode_grid(blob)
            for x, y, blob in zip(t["x"].to_pylist(), t["y"].to_pylist(),
                                  t["raster"].to_pylist())}
        self.zoom, self.method = zoom, method
        self.lon_col, self.lat_col, self.out = lon_col, lat_col, out

    def _gather(self, tx, ty, rr, cc):
        """values = grid[(tx,ty)][rr,cc], 0 where no tile — vectorized:
        pack (tx,ty) into one int64 key, argsort to group points by tile,
        then ONE dict lookup + ONE fancy-index gather per distinct tile."""
        out = np.zeros(len(tx), dtype=np.float64)
        if len(tx) == 0:
            return out
        key = (tx.astype(np.int64) << 32) | ty.astype(np.int64)
        order = np.argsort(key, kind="stable")
        uniq, starts = np.unique(key[order], return_index=True)
        bounds = np.append(starts, len(key))
        for j in range(len(uniq)):
            g = self.grids.get((int(uniq[j] >> 32),
                                int(uniq[j] & 0xFFFFFFFF)))
            if g is not None:
                idx = order[bounds[j]:bounds[j + 1]]
                out[idx] = g[rr[idx], cc[idx]]
        return out

    def _sample_nearest(self, tx, ty, col, row):
        return self._gather(tx, ty, row, col)

    def _sample_bilinear(self, lon, lat):
        # global fractional pixel coords in the z+8 grid (pixel centers
        # at integer+0.5), then blend the 4 surrounding pixels
        z8 = self.zoom + 8
        n = np.int64(1) << np.int64(z8)
        gx = (lon + 180.0) / 360.0 * n
        r = np.radians(np.clip(lat, -_tiles.MAX_LATITUDE,
                               _tiles.MAX_LATITUDE))
        gy = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * n
        fx = gx - 0.5
        fy = gy - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        wx = fx - x0
        wy = fy - y0
        out = np.zeros(len(lon), dtype=np.float64)
        for dx, dy, w in ((0, 0, (1 - wx) * (1 - wy)),
                          (1, 0, wx * (1 - wy)),
                          (0, 1, (1 - wx) * wy),
                          (1, 1, wx * wy)):
            px = np.clip(x0 + dx, 0, int(n) - 1)
            py = np.clip(y0 + dy, 0, int(n) - 1)
            out += w * self._gather(px >> 8, py >> 8, py & 255, px & 255)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        if self.method == "bilinear":
            vals = self._sample_bilinear(lon, lat)
        else:
            tx, ty, col, row = _tiles.tile_pixel(lon, lat, self.zoom, "xyz")
            vals = self._sample_nearest(tx, ty, col, row)
        return batch.append_column(self.out, pa.array(vals, pa.float64()))


def value_at_points(points_ds, tiles_table: pa.Table, zoom: int,
                    method: str = "nearest", concurrency=None, **kwargs):
    ref = ray.put(tiles_table)
    return points_ds.map_batches(
        RasterSampler,
        fn_constructor_kwargs=dict(tiles_ref=ref, zoom=zoom, method=method,
                                   **kwargs),
        batch_format="pyarrow", concurrency=_autoscale(concurrency))


def _pack_xy(x, y):
    return (np.asarray(x, np.int64) << 32) | np.asarray(y, np.int64)


MAX_BROADCAST_TILES = 4096  # ≈0.5 GB decoded — fits every worker heap


def value_at_points_auto(points_ds, tiles_ds, zoom: int,
                         id_col: str = "event_id",
                         lon_col: str = "lon", lat_col: str = "lat",
                         out: str = "raster_value",
                         method: str = "nearest",
                         max_broadcast_tiles: int = MAX_BROADCAST_TILES):
    """Size-dispatched sampler: a small tile table is the classic
    broadcast side (`ray.put` once, vectorized per-tile gather per
    batch — no shuffle at all); beyond ``max_broadcast_tiles`` the
    bucketed shuffle join takes over (no driver materialization, no
    broadcast memory cliff).  Both paths share the same pixel math."""
    tiles_mat = tiles_ds.materialize()
    if tiles_mat.count() <= max_broadcast_tiles:
        t = pa.concat_tables([b for b in tiles_mat.iter_batches(
            batch_size=65536, batch_format="pyarrow")],
            promote_options="permissive")
        sampled = value_at_points(points_ds, t, zoom, method=method,
                                  lon_col=lon_col, lat_col=lat_col,
                                  out=out)
        return sampled.map_batches(
            lambda b: pa.table({id_col: b[id_col], out: b[out]}),
            batch_format="pyarrow")
    return value_at_points_bucketed(points_ds, tiles_mat, zoom,
                                    id_col=id_col, lon_col=lon_col,
                                    lat_col=lat_col, out=out,
                                    method=method)


def value_at_points_bucketed(points_ds, tiles_ds, zoom: int,
                             id_col: str = "event_id",
                             lon_col: str = "lon", lat_col: str = "lat",
                             out: str = "raster_value",
                             method: str = "nearest",
                             n_buckets: int | None = None):
    """Scale path for value_at_points: NO tile-table broadcast and NO
    driver materialization.  Both sides are hash-bucketed by packed tile
    key (x<<32|y), co-grouped per bucket, and each bucket decodes only
    its own tile blobs once — a tile blob is never replicated per point.

    nearest: one exchange.  bilinear: each point emits ≤4 corner legs
    (tile, col, row, weight); legs are gathered per bucket then summed
    per point id in a second small exchange.

    Returns a Dataset (id_col, out)."""
    from ._pool import cluster_cpus
    B = n_buckets or max(8, cluster_cpus() * 2)

    schema = pa.schema([
        ("bucket", pa.int32()), ("key", pa.int64()), ("src", pa.int8()),
        ("pid", pa.int64()), ("col", pa.int16()), ("row", pa.int16()),
        ("w", pa.float64()), ("raster", pa.binary()),
    ])

    def tiles_side(batch: pa.Table) -> pa.Table:
        key = _pack_xy(batch["x"].to_numpy(zero_copy_only=False),
                       batch["y"].to_numpy(zero_copy_only=False))
        k = len(key)
        return pa.table({
            "bucket": pa.array((key % B).astype(np.int32)),
            "key": pa.array(key), "src": pa.array(np.ones(k, np.int8)),
            "pid": pa.array(np.zeros(k, np.int64)),
            "col": pa.array(np.zeros(k, np.int16)),
            "row": pa.array(np.zeros(k, np.int16)),
            "w": pa.array(np.zeros(k, np.float64)),
            "raster": batch["raster"].cast(pa.binary()),
        }, schema=schema)

    def points_side(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if method == "bilinear":
            npx = np.int64(1) << np.int64(zoom + 8)
            gx = (lon + 180.0) / 360.0 * npx
            r = np.radians(np.clip(lat, -_tiles.MAX_LATITUDE,
                                   _tiles.MAX_LATITUDE))
            gy = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) \
                / 2.0 * npx
            fx, fy = gx - 0.5, gy - 0.5
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            wx, wy = fx - x0, fy - y0
            keys, pids, cols, rows, ws = [], [], [], [], []
            for dx, dy, w in ((0, 0, (1 - wx) * (1 - wy)),
                              (1, 0, wx * (1 - wy)),
                              (0, 1, (1 - wx) * wy),
                              (1, 1, wx * wy)):
                px = np.clip(x0 + dx, 0, int(npx) - 1)
                py = np.clip(y0 + dy, 0, int(npx) - 1)
                keys.append(_pack_xy(px >> 8, py >> 8))
                pids.append(pid)
                cols.append((px & 255).astype(np.int16))
                rows.append((py & 255).astype(np.int16))
                ws.append(w)
            key = np.concatenate(keys)
            pid_o = np.concatenate(pids)
            col = np.concatenate(cols)
            row = np.concatenate(rows)
            w_o = np.concatenate(ws)
        else:
            tx, ty, col_, row_ = _tiles.tile_pixel(lon, lat, zoom, "xyz")
            key = _pack_xy(tx, ty)
            pid_o, w_o = pid, np.ones(len(pid), np.float64)
            col, row = col_.astype(np.int16), row_.astype(np.int16)
        return pa.table({
            "bucket": pa.array((key % B).astype(np.int32)),
            "key": pa.array(key),
            "src": pa.array(np.zeros(len(key), np.int8)),
            "pid": pa.array(pid_o), "col": pa.array(col),
            "row": pa.array(row), "w": pa.array(w_o),
            "raster": pa.array([None] * len(key), pa.binary()),
        }, schema=schema)

    both = tiles_ds.map_batches(tiles_side, batch_format="pyarrow").union(
        points_ds.map_batches(points_side, batch_format="pyarrow"))

    def per_bucket(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy(zero_copy_only=False)
        t = src == 1
        grids = {int(k): _decode_grid(blob) for k, blob in zip(
            g["key"].to_numpy(zero_copy_only=False)[t],
            np.asarray(g["raster"].to_pylist(), dtype=object)[t])}
        p = ~t
        key = g["key"].to_numpy(zero_copy_only=False)[p]
        col = g["col"].to_numpy(zero_copy_only=False)[p].astype(np.int64)
        row = g["row"].to_numpy(zero_copy_only=False)[p].astype(np.int64)
        w = g["w"].to_numpy(zero_copy_only=False)[p]
        pid = g["pid"].to_numpy(zero_copy_only=False)[p]
        vals = np.zeros(len(key), np.float64)
        order = np.argsort(key, kind="stable")
        uniq, starts = np.unique(key[order], return_index=True)
        bounds = np.append(starts, len(key))
        for j in range(len(uniq)):
            gr = grids.get(int(uniq[j]))
            if gr is not None:
                idx = order[bounds[j]:bounds[j + 1]]
                vals[idx] = gr[row[idx], col[idx]]
        return pa.table({"pid": pa.array(pid),
                         "leg": pa.array(w * vals, pa.float64())})

    legs = both.groupby("bucket").map_groups(per_bucket,
                                             batch_format="pyarrow")
    if method == "bilinear":
        import ray.data.aggregate as _agg
        res = legs.groupby("pid").aggregate(_agg.Sum("leg", alias_name=out))
    else:
        res = legs.map_batches(
            lambda b: pa.table({"pid": b["pid"], out: b["leg"]}),
            batch_format="pyarrow")
    return res.map_batches(
        lambda b: pa.table({id_col: b["pid"], out: b[out]}),
        batch_format="pyarrow")


def raster_calc(tiles_ds, fn):
    """Per-tile numpy expression (gdal raster calc / VRT pixel function,
    frmts/vrt/vrtderivedrasterband.cpp): fn(np int64 grid) → float grid.

    The float32 output goes to a DISTINCT column ``raster_f32`` and the
    uint16 ``raster`` column is dropped, so accidentally chaining a
    calc result into a uint16 consumer (contour, polygonize,
    band_stats) fails loudly on the missing column instead of silently
    reinterpreting float bytes as big-endian uint16."""

    def kernel(batch: pa.Table) -> pa.Table:
        outs = []
        for blob in batch["raster"].to_pylist():
            res = np.asarray(fn(_decode_grid(blob)), dtype="<f4")
            outs.append(zlib.compress(res.tobytes(), 6))
        return batch.drop_columns(["raster"]).append_column(
            "raster_f32", pa.array(outs, pa.binary()))

    return tiles_ds.map_batches(kernel, batch_format="pyarrow")


def decode_grid_f32(blob: bytes) -> np.ndarray:
    """Decode a raster_calc output tile (little-endian float32)."""
    raw = zlib.decompress(blob)
    if len(raw) != N_PIX * 4:
        raise ValueError(f"raster_f32 blob decodes to {len(raw)} bytes, "
                         f"expected {N_PIX * 4} (<f4 256x256)")
    return np.frombuffer(raw, dtype="<f4").reshape(TILE_SIZE, TILE_SIZE)


# GDALChecksumImage's fixed prime table (alg/gdalchecksum.cpp:55-57):
# pixel k = row*W + col contributes value % primes[k % 11]; the running
# sum is masked to 16 bits (alg/gdalchecksum.cpp:319-324).
_CHECKSUM_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43],
                            dtype=np.int64)
_PRIME_GRID = _CHECKSUM_PRIMES[
    (np.arange(N_PIX) % 11)].reshape(TILE_SIZE, TILE_SIZE)


def checksum_grid(grid: np.ndarray) -> int:
    """GDALChecksumImage of one 256×256 tile treated as its own image
    — the per-tile golden the reference's tile tests compare
    (autotest/utilities/test_gdalalg_raster_tile.py:55-69)."""
    return int((grid % _PRIME_GRID).sum() & 0xFFFF)


def tile_checksum(tiles_ds):
    """Per-tile checksum rows (z, x, y, checksum)."""

    def kernel(batch: pa.Table) -> pa.Table:
        cs = [checksum_grid(_decode_grid(b))
              for b in batch["raster"].to_pylist()]
        return pa.table({
            "z": batch["z"], "x": batch["x"], "y": batch["y"],
            "checksum": pa.array(cs, pa.int32()),
        })

    return tiles_ds.map_batches(kernel, batch_format="pyarrow")


def band_histogram(tiles_ds, vmin: float, vmax: float, n_buckets: int,
                   include_out_of_range: bool = True):
    """GDALRasterBand::GetHistogram semantics (gcore/rasterband.cpp):
    bucket = floor((v - vmin) * n_buckets / (vmax - vmin)); out-of-range
    values go to the edge buckets when ``include_out_of_range`` else
    are dropped.  Per-tile bincount partials, one tiny bucket-sum
    exchange — never a per-pixel shuffle."""
    import ray.data.aggregate as _agg

    scale = n_buckets / (vmax - vmin)

    def partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(n_buckets, dtype=np.int64)
        for blob in batch["raster"].to_pylist():
            v = _decode_grid(blob).ravel()
            idx = np.floor((v - vmin) * scale).astype(np.int64)
            if include_out_of_range:
                idx = np.clip(idx, 0, n_buckets - 1)
            else:
                m = (idx >= 0) & (idx < n_buckets)
                idx = idx[m]
            acc += np.bincount(idx, minlength=n_buckets)
        return pa.table({
            "bucket": pa.array(np.arange(n_buckets, dtype=np.int32)),
            "n_pixels": pa.array(acc),
        })

    parts = tiles_ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("bucket").aggregate(
        _agg.Sum("n_pixels", alias_name="n_pixels"))


def band_stats(tiles_ds) -> dict:
    """Global pixel statistics: ONE partial row per batch (not per
    tile), combined by Ray's distributed tree-aggregate — the driver
    only ever sees the final scalar row (band_histogram's shape;
    replaces the per-tile take_all of an earlier round)."""
    import ray.data.aggregate as _agg

    def partial(batch: pa.Table) -> pa.Table:
        s = np.int64(0); nz = np.int64(0); nt = 0
        mn = None; mx = None
        for blob in batch["raster"].to_pylist():
            g = _decode_grid(blob)
            s += g.sum(); nz += (g > 0).sum(); nt += 1
            gmn, gmx = int(g.min()), int(g.max())
            mn = gmn if mn is None else min(mn, gmn)
            mx = gmx if mx is None else max(mx, gmx)
        if nt == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("sum", "min", "max", "n_pix", "n_tiles",
                              "nonzero")})
        return pa.table({
            "sum": pa.array([int(s)]), "min": pa.array([mn]),
            "max": pa.array([mx]), "n_pix": pa.array([nt * N_PIX]),
            "n_tiles": pa.array([nt]), "nonzero": pa.array([int(nz)]),
        })

    parts = tiles_ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.aggregate(
        _agg.Sum("sum", alias_name="sum"),
        _agg.Min("min", alias_name="min"),
        _agg.Max("max", alias_name="max"),
        _agg.Sum("n_pix", alias_name="n_pix"),
        _agg.Sum("n_tiles", alias_name="n_tiles"),
        _agg.Sum("nonzero", alias_name="nonzero"))
    if not agg or agg.get("n_tiles") in (None, 0):
        return {"sum": 0, "min": 0, "max": 0, "n_pixels": 0,
                "n_tiles": 0, "nonzero": 0, "mean": 0.0}
    return {
        "sum": int(agg["sum"]),
        "min": int(agg["min"]),
        "max": int(agg["max"]),
        "n_pixels": int(agg["n_pix"]),
        "n_tiles": int(agg["n_tiles"]),
        "nonzero": int(agg["nonzero"]),
        "mean": agg["sum"] / agg["n_pix"],
    }


def mosaic_tiles(tile_tables, method: str = "first"):
    """gdalbuildvrt-style tile mosaic of N sources (apps/
    gdalbuildvrt_lib.cpp overlap semantics): sources carry PRIORITY =
    list order; per output tile,

    - ``first`` — later sources only fill pixels where every earlier
      source is 0 (the VRT top-down first-non-nodata rule with nodata
      = 0, reading source order as the reference reads band order);
    - ``sum`` — pixel-wise sum (the -addalpha-less additive composite
      of gdal_merge.py -separate workflows).

    One union + one hash exchange keyed by tile; absent sources are
    implicit zeros.  ``method`` may be a list — every composite is
    computed from the SAME exchanged quadrants and emitted with a
    ``method`` column (the fused multi-product pattern; two unioned
    pipelines measured 11 s vs one fused exchange ~4 s in-suite).
    Output: (z, x, y[, method], raster) uint16 tiles."""
    methods = list(method) if isinstance(method, (list, tuple)) \
        else [method]
    single = not isinstance(method, (list, tuple))
    for m in methods:
        if m not in ("first", "sum"):
            raise ValueError(f"unknown mosaic method {m!r}")

    parts = []
    for pri, src in enumerate(tile_tables):
        def tag(b: pa.Table, p=pri) -> pa.Table:
            return pa.table({
                "key": pa.array(
                    [(int(x) << 28) | int(y)
                     for x, y in zip(b["x"].to_pylist(),
                                     b["y"].to_pylist())], pa.int64()),
                "z": b["z"],
                "pri": pa.array([p] * b.num_rows, pa.int8()),
                "raster": b["raster"],
            })
        parts.append(src.map_batches(tag, batch_format="pyarrow"))
    emitted = parts[0].union(*parts[1:])

    def fuse(g: pa.Table) -> pa.Table:
        pris = g["pri"].to_numpy(zero_copy_only=False)
        order = np.argsort(pris, kind="stable")
        accs = {m: np.zeros((TILE_SIZE, TILE_SIZE), dtype=np.int64)
                for m in methods}
        for r in order:
            grid = np.frombuffer(
                zlib.decompress(g["raster"][int(r)].as_py()),
                dtype=">u2").reshape(TILE_SIZE, TILE_SIZE) \
                .astype(np.int64)
            for m, acc in accs.items():
                if m == "sum":
                    acc += grid
                else:
                    np.copyto(acc, np.where(acc == 0, grid, acc))
        key = int(g["key"][0].as_py())
        n = len(methods)
        cols = {
            "z": pa.array([int(g["z"][0].as_py())] * n, pa.int32()),
            "x": pa.array([key >> 28] * n, pa.int64()),
            "y": pa.array([key & ((1 << 28) - 1)] * n, pa.int64()),
            "raster": pa.array(
                [zlib.compress(np.clip(accs[m], 0, 65535)
                               .astype(">u2").tobytes(), 6)
                 for m in methods], pa.binary()),
        }
        if not single:
            cols["method"] = pa.array(methods, pa.string())
        return pa.table(cols)

    return emitted.groupby("key").map_groups(fuse,
                                             batch_format="pyarrow")


def raster_zip(tile_tables, kernel, out_dtype=">u2"):
    """Multi-raster per-pixel algebra (gdal_calc with N inputs,
    apps/gdal_calc-style -A -B expressions): aligns N tile tables by
    tile key through one hash exchange and applies
    ``kernel(grids) -> grid`` where ``grids`` is the list of N int64
    arrays (absent tiles are zeros — the zero-padded mosaic
    convention).  Output tile set = union of the input tile sets."""
    nb = len(tile_tables)

    parts = []
    for i, src in enumerate(tile_tables):
        def tag(b: pa.Table, p=i) -> pa.Table:
            return pa.table({
                "key": pa.array(
                    [(int(x) << 28) | int(y)
                     for x, y in zip(b["x"].to_pylist(),
                                     b["y"].to_pylist())], pa.int64()),
                "z": b["z"],
                "src": pa.array([p] * b.num_rows, pa.int8()),
                "raster": b["raster"],
            })
        parts.append(src.map_batches(tag, batch_format="pyarrow"))
    emitted = parts[0].union(*parts[1:])

    def fuse(g: pa.Table) -> pa.Table:
        srcs = g["src"].to_numpy(zero_copy_only=False)
        grids = [np.zeros((TILE_SIZE, TILE_SIZE), dtype=np.int64)
                 for _ in range(nb)]
        for r, s in enumerate(srcs):
            grids[int(s)] = np.frombuffer(
                zlib.decompress(g["raster"][r].as_py()),
                dtype=">u2").reshape(TILE_SIZE, TILE_SIZE) \
                .astype(np.int64)
        out = np.asarray(kernel(grids))
        key = int(g["key"][0].as_py())
        return pa.table({
            "z": pa.array([int(g["z"][0].as_py())], pa.int32()),
            "x": pa.array([key >> 28], pa.int64()),
            "y": pa.array([key & ((1 << 28) - 1)], pa.int64()),
            "raster": pa.array(
                [zlib.compress(np.clip(out, 0, 65535)
                               .astype(out_dtype).tobytes(), 6)],
                pa.binary()),
        })

    return emitted.groupby("key").map_groups(fuse,
                                             batch_format="pyarrow")


def crop_tiles(tiles_ds, cx0: int, cy0: int, w: int, h: int):
    """gdal_translate -srcwin window extraction with RE-TILING: the
    output raster's origin is the window corner, so pixels shift by
    (cx0, cy0) and each destination tile assembles from up to four
    source tiles — one hash exchange keyed by destination tile (the
    cross-resolution exchange pattern).  Destination tiles covered
    only by absent source tiles are absent (the sparse tile-table
    convention); partial edge tiles zero-fill outside the window."""
    if w <= 0 or h <= 0:
        raise ValueError("empty crop window")

    def emit(b: pa.Table) -> pa.Table:
        out = {"key": [], "z": [], "r0": [], "c0": [], "hh": [],
               "ww": [], "band": []}
        for z, x, y, blob in zip(b["z"].to_pylist(),
                                 b["x"].to_pylist(),
                                 b["y"].to_pylist(),
                                 b["raster"].to_pylist()):
            tx0, ty0 = int(x) * TILE_SIZE, int(y) * TILE_SIZE
            # source-tile ∩ window, in source coords
            sx0 = max(tx0, cx0)
            sy0 = max(ty0, cy0)
            sx1 = min(tx0 + TILE_SIZE, cx0 + w)
            sy1 = min(ty0 + TILE_SIZE, cy0 + h)
            if sx1 <= sx0 or sy1 <= sy0:
                continue
            g = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
                .reshape(TILE_SIZE, TILE_SIZE)
            # split the overlap at destination-tile boundaries
            dx0, dy0 = sx0 - cx0, sy0 - cy0
            dx1, dy1 = sx1 - cx0, sy1 - cy0
            xs = sorted({dx0, dx1}
                        | {v for v in range((dx0 // TILE_SIZE + 1)
                                            * TILE_SIZE, dx1,
                                            TILE_SIZE)})
            ys = sorted({dy0, dy1}
                        | {v for v in range((dy0 // TILE_SIZE + 1)
                                            * TILE_SIZE, dy1,
                                            TILE_SIZE)})
            for ay0, ay1 in zip(ys[:-1], ys[1:]):
                for ax0, ax1 in zip(xs[:-1], xs[1:]):
                    dtx, dty = ax0 // TILE_SIZE, ay0 // TILE_SIZE
                    sub = np.ascontiguousarray(
                        g[ay0 + cy0 - ty0:ay1 + cy0 - ty0,
                          ax0 + cx0 - tx0:ax1 + cx0 - tx0])
                    out["key"].append((dtx << 28) | dty)
                    out["z"].append(int(z))
                    out["r0"].append(ay0 - dty * TILE_SIZE)
                    out["c0"].append(ax0 - dtx * TILE_SIZE)
                    out["hh"].append(ay1 - ay0)
                    out["ww"].append(ax1 - ax0)
                    out["band"].append(
                        sub.astype(np.uint16).tobytes())
        return pa.table({
            "key": pa.array(out["key"], pa.int64()),
            "z": pa.array(out["z"], pa.int32()),
            "r0": pa.array(out["r0"], pa.int32()),
            "c0": pa.array(out["c0"], pa.int32()),
            "hh": pa.array(out["hh"], pa.int32()),
            "ww": pa.array(out["ww"], pa.int32()),
            "band": pa.array(out["band"], pa.binary()),
        })

    def assemble(g: pa.Table) -> pa.Table:
        grid = np.zeros((TILE_SIZE, TILE_SIZE), dtype=np.int64)
        for r0, c0, hh, ww, band in zip(g["r0"].to_pylist(),
                                        g["c0"].to_pylist(),
                                        g["hh"].to_pylist(),
                                        g["ww"].to_pylist(),
                                        g["band"].to_pylist()):
            sub = np.frombuffer(band, dtype=np.uint16).reshape(hh, ww)
            grid[r0:r0 + hh, c0:c0 + ww] = sub
        key = int(g["key"][0].as_py())
        return pa.table({
            "z": pa.array([int(g["z"][0].as_py())], pa.int32()),
            "x": pa.array([key >> 28], pa.int64()),
            "y": pa.array([key & ((1 << 28) - 1)], pa.int64()),
            "raster": pa.array(
                [zlib.compress(grid.astype(">u2").tobytes(), 6)],
                pa.binary()),
        })

    return tiles_ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("key").map_groups(assemble, batch_format="pyarrow")
