"""Focal (neighborhood) raster operators over the tile table.

The reference computes proximity (alg/gdalproximity.cpp) and
fillnodata (alg/rasterfill.cpp) with whole-raster scanline passes; on
the tile table every neighborhood op needs pixels from adjacent tiles,
so the shared machinery here is a HALO EXCHANGE:

    focal_map(tiles_ds, halo, kernel) —
      1. every tile emits its grid to itself + the overlapping halo
         band (width ``halo`` px) to each of its 8 neighbors, keyed by
         the DESTINATION tile — one hash-bucketed groupby co-locates a
         tile with its halo bands;
      2. per destination: assemble the (256+2h)² padded grid
         (zero-filled where no neighbor tile exists — the implicit
         zero-padded global mosaic, as contour/polygonize assume);
      3. run the vectorized ``kernel(padded, halo) -> (256,256)`` and
         emit the tile row with the transformed raster.

Kernels:
- proximity_kernel: exact Euclidean distance to the nearest nonzero
  pixel within ``maxdist``, via the separable two-pass shift
  decomposition (min over dy then dx of dy²+dx²) — NODATA (=maxdist)
  beyond; semantics of GDALComputeProximity with MAXDIST/NODATA.
- fillnodata_kernel: inverse-distance-weighted average of the nearest
  valid (nonzero) pixel in each of the 8 compass directions within
  ``maxdist`` — GDALFillNodata's directional search
  (alg/rasterfill.cpp) without the optional smoothing iterations.

``halo`` must be ≤ 256 (one tile ring); larger search radii need a
multi-ring exchange — raise, don't silently truncate.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

TILE = 256


def _pack_xy(x, y):
    return (np.int64(x) << 28) | np.int64(y)


def halo_rows(batch: pa.Table, halo: int) -> pa.Table:
    """Per tile: one full-grid row to itself + halo-band rows to every
    neighbor within ``ceil(halo/TILE)`` rings (multi-ring: a maxdist
    beyond one tile just widens the ring).  Each band row carries its
    top-left position (r0, c0) IN THE DESTINATION'S padded frame, so
    assembly is a direct paste."""
    keys, zs, r0s, c0s, payloads, h0s, w0s, selfs = \
        [], [], [], [], [], [], [], []
    rings = int(np.ceil(halo / TILE))
    frame = TILE + 2 * halo
    for z, x, y, blob in zip(batch["z"].to_pylist(), batch["x"].to_pylist(),
                             batch["y"].to_pylist(),
                             batch["raster"].to_pylist()):
        g = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
            .reshape(TILE, TILE)
        z, x, y = int(z), int(x), int(y)
        for dy in range(-rings, rings + 1):
            for dx in range(-rings, rings + 1):
                nx, ny = x + dx, y + dy
                if nx < 0 or ny < 0:
                    continue
                # my grid origin in N's padded frame, then the visible
                # window = my tile rect ∩ the frame rect
                r0_full = halo - dy * TILE
                c0_full = halo - dx * TILE
                rs0 = max(0, -r0_full)
                cs0 = max(0, -c0_full)
                rs1 = min(TILE, frame - r0_full)
                cs1 = min(TILE, frame - c0_full)
                if rs1 <= rs0 or cs1 <= cs0:
                    continue
                sub = np.ascontiguousarray(g[rs0:rs1, cs0:cs1])
                keys.append(_pack_xy(nx, ny))
                zs.append(z)
                r0s.append(r0_full + rs0)
                c0s.append(c0_full + cs0)
                payloads.append(sub.astype(np.uint16).tobytes())
                h0s.append(sub.shape[0])
                w0s.append(sub.shape[1])
                selfs.append(dy == 0 and dx == 0)
    return pa.table({
        "dest": pa.array(keys, pa.int64()),
        "z": pa.array(zs, pa.int32()),
        "r0": pa.array(r0s, pa.int32()),
        "c0": pa.array(c0s, pa.int32()),
        "h": pa.array(h0s, pa.int32()),
        "w": pa.array(w0s, pa.int32()),
        "is_self": pa.array(selfs, pa.bool_()),
        "band": pa.array(payloads, pa.binary()),
    })


def _assemble(rows, halo: int):
    """rows of one destination tile → (256+2h)² padded float grid, or
    None when the tile itself is absent (halo bands alone don't make a
    tile — the destination must exist in the tile table)."""
    pad = np.zeros((TILE + 2 * halo, TILE + 2 * halo), dtype=np.float64)
    has_self = False
    for r0, c0, h, w, is_self, band in rows:
        sub = np.frombuffer(band, dtype=np.uint16).reshape(h, w)
        has_self = has_self or is_self
        pad[r0:r0 + h, c0:c0 + w] = sub
    return pad if has_self else None


def focal_map(tiles_ds, halo: int, kernel, out_col: str = "raster_f32",
              n_buckets: int | None = None):
    """Halo exchange + per-tile kernel.  Output rows: (z, x, y,
    ``out_col``) with the kernel's float32 grid zlib-compressed.
    ``out_col`` may be a list of names, in which case the kernel
    returns a (k, 256, 256) stack and each plane lands in its own
    binary column — one exchange feeds k derived grids (the gdaldem
    multi-product pattern, stages/dem.py)."""
    if halo <= 0:
        raise ValueError(f"halo must be positive, got {halo}")
    cols = list(out_col) if isinstance(out_col, (list, tuple)) \
        else [out_col]
    single = not isinstance(out_col, (list, tuple))
    from ._pool import cluster_cpus
    B = n_buckets or max(16, cluster_cpus() * 2)

    emit = tiles_ds.map_batches(lambda b: halo_rows(b, halo),
                                batch_format="pyarrow")
    emit = emit.map_batches(
        lambda b: b.append_column(
            "bucket", pa.array((b["dest"].to_numpy(zero_copy_only=False)
                                % B).astype(np.int32))),
        batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        dest = g["dest"].to_numpy(zero_copy_only=False)
        order = np.argsort(dest, kind="stable")
        r0a = g["r0"].to_numpy(zero_copy_only=False)
        c0a = g["c0"].to_numpy(zero_copy_only=False)
        hh = g["h"].to_numpy(zero_copy_only=False)
        ww = g["w"].to_numpy(zero_copy_only=False)
        zz = g["z"].to_numpy(zero_copy_only=False)
        selfs = g["is_self"].to_numpy(zero_copy_only=False)
        bands = g["band"].to_pylist()
        ds_ = dest[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        ends = np.r_[starts[1:], len(ds_)]
        out = {"z": [], "x": [], "y": []}
        for c in cols:
            out[c] = []
        for s, e in zip(starts, ends):
            rows = order[s:e]
            key = int(ds_[s])
            pad = _assemble([(int(r0a[r]), int(c0a[r]), int(hh[r]),
                              int(ww[r]), bool(selfs[r]), bands[r])
                             for r in rows], halo)
            if pad is None:
                continue
            res = kernel(pad, halo)
            planes = [res] if single else list(res)
            if len(planes) != len(cols):
                raise ValueError(
                    f"kernel returned {len(planes)} planes for "
                    f"{len(cols)} out_cols")
            out["z"].append(int(zz[rows[0]]))
            out["x"].append(key >> 28)
            out["y"].append(key & ((1 << 28) - 1))
            for c, grid in zip(cols, planes):
                out[c].append(zlib.compress(
                    np.asarray(grid, dtype="<f4").tobytes(), 6))
        return pa.table({
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64()),
            **{c: pa.array(out[c], pa.binary()) for c in cols},
        })

    return emit.groupby("bucket").map_groups(per_bucket,
                                             batch_format="pyarrow")


def proximity_kernel(maxdist: int):
    """Exact Euclidean distance to the nearest nonzero pixel within
    ``maxdist`` px; pixels farther away (or with no target) get
    ``maxdist`` (the reference's NODATA/MAXDIST fill,
    alg/gdalproximity.cpp:362-392).  Separable two-pass shift
    decomposition: vdist²(r,c) = min_dy dy² over targets in the
    column, then dist²(r,c) = min_dx (vdist²(r,c+dx) + dx²)."""
    def kernel(pad: np.ndarray, halo: int) -> np.ndarray:
        m = int(min(maxdist, halo))
        big = float(maxdist) ** 2
        target = pad > 0
        H, W = pad.shape
        v2 = np.full((H, W), big)
        for dy in range(-m, m + 1):
            sl_dst = slice(max(0, -dy), min(H, H - dy))
            sl_src = slice(max(0, dy), min(H, H + dy))
            hit = target[sl_src, :]
            v2[sl_dst, :][hit] = np.minimum(v2[sl_dst, :][hit],
                                            float(dy * dy))
        d2 = np.full((H, W), big)
        for dx in range(-m, m + 1):
            sl_dst = slice(max(0, -dx), min(W, W - dx))
            sl_src = slice(max(0, dx), min(W, W + dx))
            d2[:, sl_dst] = np.minimum(d2[:, sl_dst],
                                       v2[:, sl_src] + float(dx * dx))
        out = np.sqrt(d2[halo:halo + TILE, halo:halo + TILE])
        return np.minimum(out, float(maxdist))
    return kernel


_DIRS = [(-1, 0), (1, 0), (0, -1), (0, 1),
         (-1, -1), (-1, 1), (1, -1), (1, 1)]


def fillnodata_kernel(maxdist: int):
    """GDALFillNodata-style directional IDW (alg/rasterfill.cpp):
    zero pixels take the 1/d-weighted mean of the nearest VALID
    (nonzero) pixel found along each of the 8 compass directions
    within ``maxdist`` steps; pixels with no hit stay 0."""
    def kernel(pad: np.ndarray, halo: int) -> np.ndarray:
        m = int(min(maxdist, halo))
        valid = pad > 0
        H, W = pad.shape
        wsum = np.zeros((H, W))
        vsum = np.zeros((H, W))
        for dy, dx in _DIRS:
            found = np.zeros((H, W), dtype=bool)
            step = np.sqrt(dy * dy + dx * dx)
            for k in range(1, m + 1):
                oy, ox = dy * k, dx * k
                rd = slice(max(0, -oy), min(H, H - oy))
                cd = slice(max(0, -ox), min(W, W - ox))
                rsrc = slice(max(0, oy), min(H, H + oy))
                csrc = slice(max(0, ox), min(W, W + ox))
                hit = valid[rsrc, csrc] & ~found[rd, cd]
                if hit.any():
                    w = 1.0 / (step * k)
                    sub_w = wsum[rd, cd]
                    sub_v = vsum[rd, cd]
                    sub_w[hit] += w
                    sub_v[hit] += w * pad[rsrc, csrc][hit]
                    wsum[rd, cd] = sub_w
                    vsum[rd, cd] = sub_v
                    f = found[rd, cd]
                    f |= hit
                    found[rd, cd] = f
        with np.errstate(invalid="ignore", divide="ignore"):
            filled = np.where(wsum > 0, vsum / wsum, 0.0)
        out = np.where(valid, pad, filled)
        return out[halo:halo + TILE, halo:halo + TILE]
    return kernel


def proximity(tiles_ds, maxdist: int = 32):
    return focal_map(tiles_ds, halo=maxdist, kernel=proximity_kernel(maxdist))


def fillnodata(tiles_ds, maxdist: int = 32):
    return focal_map(tiles_ds, halo=maxdist,
                     kernel=fillnodata_kernel(maxdist))
