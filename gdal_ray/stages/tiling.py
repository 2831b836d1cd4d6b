"""Tile assignment, tile build and pyramid reduction.

The raster↔vector core (SURVEY.md §2.9), re-expressed Ray-Data-first:

- **assign**: ``gdal_rasterize``-style tile/pixel assignment
  (alg/gdalrasterize.cpp burn semantics) — a stateless ``map_batches``
  computing (z, x, y[, pixel]) per point per requested zoom; one output
  row per (point, zoom), expanded columnar-ly (np.repeat + take);
- **tile build**: per-tile aggregation — MERGE_ALG=ADD ≡ count/sum per
  tile or per pixel (alg/gdalrasterize.cpp:817-834);
- **pyramid**: overview tiles at z−1 built from the z result —
  ``GenerateOverviewTile`` child gathering (apps/gdalalg_raster_tile.cpp:
  1487,6062-6089) ≡ per-level ``groupby((z-1, x>>1, y>>1))`` reduction,
  a log-depth tree of shuffles;
- **render**: a 256×256 count raster per tile (np.bincount), optionally
  PNG-encoded by a dependency-free encoder (tile directory sink
  convention z/x/y.png, apps/gdalalg_raster_tile.cpp:655-671).

Counts are aggregated partial-then-final: per-batch pyarrow group_by
produces one row per touched tile per batch, so the wide shuffle moves
tile partials, never page rows.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import tiles as _tiles

TILE_SIZE = _tiles.TILE_SIZE


def assign_tiles_batch(batch: pa.Table, zooms, convention: str = "xyz",
                       lon_col: str = "lon", lat_col: str = "lat",
                       keep_cols=None, with_pixel: bool = False,
                       profile: str = "mercator") -> pa.Table:
    """One output row per (input row, zoom): keep_cols ++ (z, x, y
    [, px, py]).  Fully columnar: indices repeated, then take().
    profile: "mercator" (WebMercatorQuad) or "geodetic"
    (plate-carrée WorldCRS84Quad, tiles only)."""
    if profile not in ("mercator", "geodetic"):
        raise ValueError(f"profile must be mercator|geodetic, got {profile}")
    lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
    lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(lon)
    zooms = list(zooms)
    zs, xs, ys, pxs, pys = [], [], [], [], []
    for z in zooms:
        if with_pixel:
            px_fn = (_tiles.tile_pixel_geodetic if profile == "geodetic"
                     else _tiles.tile_pixel)
            tx, ty, col, row = px_fn(lon, lat, z, convention)
            pxs.append(col)
            pys.append(row)
        elif profile == "geodetic":
            tx, ty = _tiles.lonlat_to_tile_geodetic(lon, lat, z, convention)
        else:
            tx, ty = _tiles.lonlat_to_tile(lon, lat, z, convention)
        zs.append(np.full(n, z, dtype=np.int32))
        xs.append(tx)
        ys.append(ty)
    cols: dict[str, pa.Array] = {}
    kept_names = keep_cols if keep_cols is not None else batch.column_names
    if kept_names:
        rep = pa.array(np.tile(np.arange(n, dtype=np.int64), len(zooms)))
        kept = batch.select(kept_names).take(rep)
        cols.update({name: kept[name] for name in kept_names})
    cols["z"] = pa.array(np.concatenate(zs), pa.int32())
    cols["x"] = pa.array(np.concatenate(xs), pa.int64())
    cols["y"] = pa.array(np.concatenate(ys), pa.int64())
    if with_pixel:
        cols["px"] = pa.array(np.concatenate(pxs), pa.int32())
        cols["py"] = pa.array(np.concatenate(pys), pa.int32())
    return pa.table(cols)


def partial_tile_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one (z,x,y,n_pages) partial row per touched
    tile — the partial side of partial+final aggregation (keeps the
    groupby shuffle small; SURVEY.md §4 skew row)."""
    g = batch.group_by(["z", "x", "y"]).aggregate([([], "count_all")])
    return g.rename_columns(["z", "x", "y", "n_pages"])


def tile_counts_g8(ds, zooms, g8_col: str = "g8"):
    """``tile_counts`` over a PRE-PACKED z8 global pixel column
    ((gx8 << 16) | gy8 stored as int32): tile x/y at any z ≤ 8 are
    pure shifts of the z8 pixel — floor((lon+180)/360·2^z) ==
    floor((lon+180)/360·2^16) >> (16−z) exactly, because scaling a
    double by a power of two is exact and floor-division composes.
    Lets the upstream dedup exchange carry 4 bytes of position
    instead of 16 bytes of lat/lon."""
    from .aggregate import bucketed_group_agg

    zooms = list(zooms)
    assert all(0 <= z <= 8 for z in zooms), "g8 path needs zooms <= 8"

    def assigned(b: pa.Table) -> pa.Table:
        g = b[g8_col].to_numpy(zero_copy_only=False).view(np.uint32)
        gx = (g >> np.uint32(16)).astype(np.int64)
        gy = (g & np.uint32(0xFFFF)).astype(np.int64)
        n = len(g)
        zs, xs, ys = [], [], []
        for z in zooms:
            s = 16 - z
            zs.append(np.full(n, z, np.int32))
            xs.append((gx >> s).astype(np.int32))
            ys.append((gy >> s).astype(np.int32))
        t = pa.table({"z": pa.array(np.concatenate(zs)),
                      "x": pa.array(np.concatenate(xs)),
                      "y": pa.array(np.concatenate(ys))})
        return partial_tile_counts(t)

    return bucketed_group_agg(ds.map_batches(assigned,
                                             batch_format="pyarrow"),
                              ["z", "x", "y"],
                              [("n_pages", "sum", "n_pages")])


def tile_counts(ds, zooms, convention: str = "xyz",
                lon_col: str = "lon", lat_col: str = "lat",
                profile: str = "mercator"):
    """Dataset pipeline: assign → per-batch partials → bucketed final sum.
    Returns a Dataset of (z, x, y, n_pages).

    The final uses the hash-bucket shuffle (stages.aggregate.
    bucketed_group_agg) rather than a composite-key sort-aggregate:
    random page order means every block touches most tiles, so partials
    barely reduce and the multi-key sort path pays ~input-sized work."""
    from .aggregate import bucketed_group_agg

    assigned = ds.map_batches(
        lambda b: partial_tile_counts(
            assign_tiles_batch(b, zooms, convention, lon_col, lat_col,
                               keep_cols=[], profile=profile)),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(assigned, ["z", "x", "y"],
                              [("n_pages", "sum", "n_pages")])


def pyramid_counts(tile_counts_table: pa.Table, min_zoom: int = 0) -> pa.Table:
    """Build overview levels down to min_zoom from a base-zoom count
    table (single-level driver-side variant for small results; the
    Dataset variant is ``pyramid_counts_ds``).  Conservation invariant:
    each parent's count == sum of its ≤4 children."""
    tile_counts_table = tile_counts_table.select(["z", "x", "y", "n_pages"])
    frames = [tile_counts_table]
    cur = tile_counts_table
    while True:
        z = pc.min(cur["z"]).as_py()
        if z is None or z <= min_zoom:
            break
        parent = pa.table({
            "z": pc.cast(pc.subtract(cur["z"], 1), cur["z"].type),
            "x": pc.shift_right(cur["x"], 1),
            "y": pc.shift_right(cur["y"], 1),
            "n_pages": cur["n_pages"],
        })
        cur = (parent.group_by(["z", "x", "y"])
               .aggregate([("n_pages", "sum")])
               .rename_columns(["z", "x", "y", "n_pages"]))
        frames.append(cur)
    return pa.concat_tables(frames)


def pyramid_counts_ds(ds, base_zoom: int, min_zoom: int = 0):
    """Dataset variant of the overview pyramid for COUNT tiles.

    Count overviews are fully associative (a parent's count is the sum
    of all its level-z descendants), so instead of the reference's
    level-by-level reduction (GenerateOverviewTile child gathering,
    apps/gdalalg_raster_tile.cpp:6062-6089 — needed there because
    overview PIXELS resample from child rasters) every base tile emits
    its ancestor keys for ALL levels in one vectorized pass and a SINGLE
    groupby sums them: one all-to-all instead of (base-min) sequential
    shuffle barriers.  Output includes the base level itself.  For
    pixel-resampled pyramids (render path) use per-level map_groups."""
    from .aggregate import bucketed_group_agg

    n_levels = base_zoom - min_zoom + 1

    def expand_ancestors(b: pa.Table) -> pa.Table:
        z = b["z"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n_pages"].to_numpy(zero_copy_only=False)
        zs, xs, ys, ns = [], [], [], []
        for k in range(n_levels):
            zs.append(np.full(len(b), base_zoom - k, dtype=z.dtype))
            xs.append(x >> k)
            ys.append(y >> k)
            ns.append(n)
        return pa.table({
            "z": pa.array(np.concatenate(zs)),
            "x": pa.array(np.concatenate(xs)),
            "y": pa.array(np.concatenate(ys)),
            "n_pages": pa.array(np.concatenate(ns)),
        })

    expanded = ds.map_batches(expand_ancestors, batch_format="pyarrow")
    return bucketed_group_agg(expanded, ["z", "x", "y"],
                              [("n_pages", "sum", "n_pages")])


def overview_level(tiles_ds, resampling: str = "average",
                   n_buckets: int | None = None):
    """One PIXEL-RESAMPLED overview level z → z−1
    (``GenerateOverviewTile``, apps/gdalalg_raster_tile.cpp:1487): each
    child tile downsamples its 256² grid to 128² and ships the quadrant
    to its parent key; one bucketed exchange assembles ≤4 quadrants per
    parent.  resampling:

    - ``average`` — 2×2 block mean, integer round-half-up
      ``(s+2)>>2`` (GDAL "average" on integer bands);
    - ``nearest`` — top-left source pixel of each 2×2 block;
    - ``min`` / ``max`` — block extrema (gcore/overview.cpp
      GDALResampleChunk32R_Mode family's min/max kernels);
    - ``rms`` — round-half-up of sqrt(mean of squares);
    - ``mode`` — most frequent of the 4, ties resolved exactly like
      the reference's count-map scan (`if (count > maxCount)`,
      gcore/overview.cpp): the value whose 2nd occurrence appears
      first in scan order wins; all-distinct blocks keep the first
      value.

    Unlike ``pyramid_counts_ds`` (associative count sums, one shuffle
    for all levels) pixel resampling is NOT associative across levels,
    so multi-level pyramids chain this per level, as the reference
    does."""
    from ._pool import cluster_cpus

    B = n_buckets or max(16, cluster_cpus() * 2)
    methods = list(resampling) if isinstance(resampling, (list, tuple)) \
        else [resampling]
    single = not isinstance(resampling, (list, tuple))
    known = ("average", "nearest", "min", "max", "rms", "mode")
    for m in methods:
        if m not in known:
            raise ValueError(f"unsupported resampling {m!r}")

    def _down(g, method):
        v0, v1 = g[0::2, 0::2], g[0::2, 1::2]
        v2, v3 = g[1::2, 0::2], g[1::2, 1::2]
        if method == "average":
            return (v0 + v1 + v2 + v3 + 2) >> 2
        if method == "nearest":
            return v0
        if method == "min":
            return np.minimum(np.minimum(v0, v1), np.minimum(v2, v3))
        if method == "max":
            return np.maximum(np.maximum(v0, v1), np.maximum(v2, v3))
        if method == "rms":
            s2 = v0 * v0 + v1 * v1 + v2 * v2 + v3 * v3
            return np.floor(np.sqrt(s2 / 4.0) + 0.5).astype(np.int64)
        # mode — winner is the first value to reach count 2
        return np.where(
            v0 == v1, v0,
            np.where((v2 == v0) | (v2 == v1), v2,
                     np.where((v3 == v0) | (v3 == v1) | (v3 == v2),
                              v3, v0)))

    def emit(b: pa.Table) -> pa.Table:
        out = {"bucket": [], "pkey": [], "m": [], "z": [], "qx": [],
               "qy": [], "n_pages": [], "down": []}
        for z, x, y, npg, blob in zip(
                b["z"].to_pylist(), b["x"].to_pylist(),
                b["y"].to_pylist(), b["n_pages"].to_pylist(),
                b["raster"].to_pylist()):
            g = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
                .reshape(TILE_SIZE, TILE_SIZE).astype(np.int64)
            pkey = ((int(x) >> 1) << 32) | (int(y) >> 1)
            for mi, method in enumerate(methods):
                down = _down(g, method)
                out["bucket"].append(pkey % B)
                out["pkey"].append(pkey)
                out["m"].append(mi)
                out["z"].append(int(z) - 1)
                out["qx"].append(int(x) & 1)
                out["qy"].append(int(y) & 1)
                out["n_pages"].append(int(npg))
                out["down"].append(zlib.compress(
                    down.astype(">u2").tobytes(), 6))
        return pa.table({
            "bucket": pa.array(out["bucket"], pa.int32()),
            "pkey": pa.array(out["pkey"], pa.int64()),
            "m": pa.array(out["m"], pa.int8()),
            "z": pa.array(out["z"], pa.int32()),
            "qx": pa.array(out["qx"], pa.int8()),
            "qy": pa.array(out["qy"], pa.int8()),
            "n_pages": pa.array(out["n_pages"], pa.int64()),
            "down": pa.array(out["down"], pa.binary()),
        })

    emitted = tiles_ds.map_batches(emit, batch_format="pyarrow")
    half = TILE_SIZE // 2

    def assemble(g: pa.Table) -> pa.Table:
        pk = (g["pkey"].to_numpy(zero_copy_only=False)
              * len(methods)
              + g["m"].to_numpy(zero_copy_only=False))
        order = np.argsort(pk, kind="stable")
        pk_s = pk[order]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        ends = np.r_[starts[1:], len(pk_s)]
        zz = g["z"].to_numpy(zero_copy_only=False)
        qx = g["qx"].to_numpy(zero_copy_only=False)
        qy = g["qy"].to_numpy(zero_copy_only=False)
        npg = g["n_pages"].to_numpy(zero_copy_only=False)
        blobs = g["down"].to_pylist()
        out = {"z": [], "x": [], "y": [], "n_pages": [], "raster": [],
               "method": []}
        for s, e in zip(starts, ends):
            grid = np.zeros((TILE_SIZE, TILE_SIZE), dtype=np.int64)
            total = 0
            for r in order[s:e]:
                d = np.frombuffer(zlib.decompress(blobs[r]),
                                  dtype=">u2").reshape(half, half)
                r0, c0 = int(qy[r]) * half, int(qx[r]) * half
                grid[r0:r0 + half, c0:c0 + half] = d
                total += int(npg[r])
            k = int(pk_s[s]) // len(methods)
            out["method"].append(methods[int(pk_s[s]) % len(methods)])
            out["z"].append(int(zz[order[s]]))
            out["x"].append(k >> 32)
            out["y"].append(k & 0xFFFFFFFF)
            out["n_pages"].append(total)
            out["raster"].append(zlib.compress(
                grid.astype(">u2").tobytes(), 6))
        cols = {
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "n_pages": pa.array(out["n_pages"], pa.int64()),
            "raster": pa.array(out["raster"], pa.binary()),
        }
        if not single:
            cols["method"] = pa.array(out["method"], pa.string())
        return pa.table(cols)

    return emitted.groupby("bucket").map_groups(assemble,
                                                batch_format="pyarrow")


def pyramid_overviews(tiles_ds, base_zoom: int, min_zoom: int,
                      resampling: str = "average"):
    """Pixel-resampled overview pyramid: base tiles at ``base_zoom`` →
    union of levels ``base_zoom-1 .. min_zoom``.  Each level is
    materialized before feeding the next (levels shrink 4× per step;
    the reference likewise writes each overview level before reading it
    back, apps/gdalalg_raster_tile.cpp:6062-6089)."""
    levels = []
    cur = tiles_ds
    for _ in range(base_zoom, min_zoom, -1):
        cur = overview_level(cur, resampling=resampling).materialize()
        levels.append(cur)
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


# --- per-tile raster rendering --------------------------------------------


def render_tile_group(group: pa.Table) -> pa.Table:
    """map_groups kernel: (z,x,y) group of pixel rows → one tile row with
    a zlib-compressed uint16 256×256 count raster (raw, row-major).
    MERGE_ALG=ADD semantics: each page adds 1 to its pixel."""
    px = group["px"].to_numpy(zero_copy_only=False).astype(np.int64)
    py = group["py"].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(py * TILE_SIZE + px,
                         minlength=TILE_SIZE * TILE_SIZE)
    grid = np.clip(counts, 0, 65535).astype(">u2")
    return pa.table({
        "z": group["z"][:1],
        "x": group["x"][:1],
        "y": group["y"][:1],
        "n_pages": pa.array([len(group)], pa.int64()),
        "raster": pa.array([zlib.compress(grid.tobytes(), 6)], pa.binary()),
    })


def encode_png_gray16(grid_be_u2: bytes) -> bytes:
    """Dependency-free 16-bit grayscale PNG encoder (stdlib zlib only).
    Input: big-endian uint16 raster bytes, 256×256 row-major."""
    w = h = TILE_SIZE

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)  # 16-bit gray
    row_len = w * 2
    raw = b"".join(
        b"\x00" + grid_be_u2[i * row_len : (i + 1) * row_len] for i in range(h)
    )
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def write_tile_directory(tiles_ds, out_dir: str, resume: bool = False):
    """z/x/y tile-directory datasink: each tile row becomes
    ``out_dir/<z>/<x>/<y>.png`` (16-bit grayscale PNG), the layout of
    `gdal raster tile` (apps/gdalalg_raster_tile.cpp:655-671, file y =
    XYZ row via GetFileY :510-512 — the tile table already carries XYZ
    rows).

    ``resume=True`` skips tiles whose file already exists
    (gdalalg_raster_tile.cpp:289 --resume), making a re-run after a
    failure write only the missing tiles.  Writes are atomic
    (tmp + rename), so a killed run never leaves a torn tile and
    resume semantics stay correct.

    Returns a Dataset of (z, x, y, path, written) rows — consuming it
    drives the writes (one task per block, embarrassingly parallel)."""
    import os

    def write_batch(b: pa.Table) -> pa.Table:
        paths, written = [], []
        for z, x, y, blob in zip(b["z"].to_pylist(), b["x"].to_pylist(),
                                 b["y"].to_pylist(),
                                 b["raster"].to_pylist()):
            d = os.path.join(out_dir, str(int(z)), str(int(x)))
            path = os.path.join(d, f"{int(y)}.png")
            paths.append(path)
            if resume and os.path.exists(path):
                written.append(False)
                continue
            os.makedirs(d, exist_ok=True)
            png = encode_png_gray16(zlib.decompress(blob))
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(png)
            os.replace(tmp, path)
            written.append(True)
        return pa.table({
            "z": b["z"], "x": b["x"], "y": b["y"],
            "path": pa.array(paths, pa.string()),
            "written": pa.array(written, pa.bool_()),
        })

    return tiles_ds.map_batches(write_batch, batch_format="pyarrow")


def render_tiles(ds, zoom: int, convention: str = "xyz",
                 lon_col: str = "lon", lat_col: str = "lat",
                 n_buckets: int | None = None,
                 profile: str = "mercator"):
    """Full tile-build pipeline at one zoom, partial-then-final: each
    batch pre-aggregates its points into SPARSE per-tile partials
    (nonzero ravel indices + counts), so the exchange moves one small
    row per (batch, tile) instead of one row per point; one bucketed
    groupby then sums partials per tile.  (The previous per-point
    3-column groupby shuffle cost ~6 s at sf0.1 — 20× the actual
    compute.)"""
    from ._pool import cluster_cpus

    B = n_buckets or max(16, cluster_cpus() * 2)

    def partial(b: pa.Table) -> pa.Table:
        lon = b[lon_col].to_numpy(zero_copy_only=False)
        lat = b[lat_col].to_numpy(zero_copy_only=False)
        px_fn = (_tiles.tile_pixel_geodetic if profile == "geodetic"
                 else _tiles.tile_pixel)
        tx, ty, col, row = px_fn(lon, lat, zoom, convention)
        key = (tx.astype(np.int64) << 32) | ty.astype(np.int64)
        pix = (row.astype(np.int64) * TILE_SIZE + col).astype(np.int64)
        order = np.argsort(key, kind="stable")
        k_s, p_s = key[order], pix[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        ends = np.r_[starts[1:], len(k_s)]
        keys, blobs, npages = [], [], []
        for s, e in zip(starts, ends):
            idx, cnt = np.unique(p_s[s:e], return_counts=True)
            keys.append(int(k_s[s]))
            blobs.append(idx.astype(np.int32).tobytes()
                         + cnt.astype(np.int32).tobytes())
            npages.append(int(e - s))
        keys_a = np.asarray(keys, dtype=np.int64)
        return pa.table({
            "key": pa.array(keys_a),
            "bucket": pa.array((keys_a % B).astype(np.int32)),
            "n_pages": pa.array(npages, pa.int64()),
            "partial": pa.array(blobs, pa.binary()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        npages = g["n_pages"].to_numpy(zero_copy_only=False)
        blobs = g["partial"].to_pylist()
        order = np.argsort(key, kind="stable")
        k_s = key[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        ends = np.r_[starts[1:], len(k_s)]
        out = {"z": [], "x": [], "y": [], "n_pages": [], "raster": []}
        for s, e in zip(starts, ends):
            grid = np.zeros(TILE_SIZE * TILE_SIZE, dtype=np.int64)
            total = 0
            for r in order[s:e]:
                raw = np.frombuffer(blobs[r], dtype=np.int32)
                h = len(raw) // 2
                np.add.at(grid, raw[:h].astype(np.int64), raw[h:])
                total += int(npages[r])
            k = int(k_s[s])
            out["z"].append(zoom)
            out["x"].append(k >> 32)
            out["y"].append(k & 0xFFFFFFFF)
            out["n_pages"].append(total)
            out["raster"].append(zlib.compress(
                np.clip(grid, 0, 65535).astype(">u2").tobytes(), 6))
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            "n_pages": pa.array(out["n_pages"], pa.int64()),
            "raster": pa.array(out["raster"], pa.binary()),
        })

    return parts.groupby("bucket").map_groups(finish,
                                              batch_format="pyarrow")


def encode_png_rgba8(rgba: "np.ndarray") -> bytes:
    """Dependency-free 8-bit RGBA PNG encoder (stdlib zlib only).
    Input: (256, 256, 4) uint8 array."""
    h, w = rgba.shape[0], rgba.shape[1]

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    body = rgba.astype(np.uint8).tobytes()
    row_len = w * 4
    raw = b"".join(
        b"\x00" + body[i * row_len:(i + 1) * row_len] for i in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def colormap_tiles(tiles_ds, stops, nodata_alpha: bool = True,
                   vmin: float = 0.0, vmax: float | None = None):
    """`gdal raster color-map` + `nodata-to-alpha`
    (apps/gdalalg_raster_color_map.cpp semantics): map the uint16 count
    grid through a linear color ramp into RGBA tiles.

    ``stops``: list of (value_fraction 0..1, (r, g, b)) gradient stops;
    values are normalized by (vmin, vmax) (vmax default = per-tile max,
    pass an absolute max for a globally consistent ramp).  Zero pixels
    get alpha 0 when ``nodata_alpha`` (the nodata-to-alpha step).
    Output rows: (z, x, y, png) ready for `write_tile_directory`-style
    sinks."""
    stops = sorted(stops)
    fr = np.array([s[0] for s in stops], dtype=np.float64)
    cols = np.array([s[1] for s in stops], dtype=np.float64)

    def kernel(batch: pa.Table) -> pa.Table:
        pngs = []
        for blob in batch["raster"].to_pylist():
            g = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
                .reshape(TILE_SIZE, TILE_SIZE).astype(np.float64)
            top = vmax if vmax is not None else max(float(g.max()), 1.0)
            t = np.clip((g - vmin) / max(top - vmin, 1e-9), 0.0, 1.0)
            rgba = np.empty((TILE_SIZE, TILE_SIZE, 4), dtype=np.uint8)
            for c in range(3):
                rgba[:, :, c] = np.interp(t, fr, cols[:, c]) \
                    .round().astype(np.uint8)
            rgba[:, :, 3] = 255
            if nodata_alpha:
                rgba[:, :, 3] = np.where(g > 0, 255, 0)
            pngs.append(encode_png_rgba8(rgba))
        return pa.table({
            "z": batch["z"], "x": batch["x"], "y": batch["y"],
            "png": pa.array(pngs, pa.binary()),
        })

    return tiles_ds.map_batches(kernel, batch_format="pyarrow")
