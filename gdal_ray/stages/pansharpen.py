"""Weighted-Brovey pansharpening (alg/gdalpansharpen.cpp).

The reference's GDALPansharpenOperation::WeightedBrovey3 (:592):
per pixel, dfPseudoPanchro = Σ_i weight_i · upsampled_spectral_i;
dfFactor = pan / pseudo (0 when pseudo == 0, ComputeFactor :567);
out_i = spectral_i · factor.  Work type here is float64 (count
rasters), so no bit-depth clamp applies.

Cross-resolution layout: the panchromatic band is the z-level tile
table, the spectral bands are tile tables one zoom COARSER (2× pixel
size), upsampled NEAREST (the resampling is a documented parameter of
the reference operation; nearest keeps the oracle a closed form).

Ray decomposition: each spectral tile splits into its four child
quadrants keyed by the CHILD tile; pan tiles key themselves; ONE
hash exchange groups a child tile with its ≤ n_bands quadrants and
the fused per-tile kernel runs vectorized.  The output tile set is
the pan tile set; spectral gaps are zero (pseudo = 0 → factor = 0,
as the reference).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

TILE = 256
HALF = 128


def pansharpen(pan_tiles, band_tiles, weights):
    """pan_tiles: tile table at zoom z; band_tiles: list of tile
    tables at zoom z-1 (spectral bands); weights: per-band floats.
    Output rows: (z, x, y, band_0 .. band_{k-1}) — zlib'd <f4 grids
    of the pansharpened bands."""
    nb = len(band_tiles)
    if len(weights) != nb:
        raise ValueError("one weight per band required")
    w = [float(v) for v in weights]

    def emit_pan(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": pa.array([(int(x) << 28) | int(y)
                             for x, y in zip(b["x"].to_pylist(),
                                             b["y"].to_pylist())],
                            pa.int64()),
            "z": b["z"],
            "tag": pa.array([-1] * b.num_rows, pa.int8()),
            "grid": b["raster"],
        })

    def emit_band(i):
        def emit(b: pa.Table) -> pa.Table:
            keys, zs, tags, grids = [], [], [], []
            for z, x, y, blob in zip(b["z"].to_pylist(),
                                     b["x"].to_pylist(),
                                     b["y"].to_pylist(),
                                     b["raster"].to_pylist()):
                g = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
                    .reshape(TILE, TILE)
                for qy in (0, 1):
                    for qx in (0, 1):
                        sub = np.ascontiguousarray(
                            g[qy * HALF:(qy + 1) * HALF,
                              qx * HALF:(qx + 1) * HALF])
                        keys.append(((2 * int(x) + qx) << 28)
                                    | (2 * int(y) + qy))
                        zs.append(int(z) + 1)
                        tags.append(i)
                        grids.append(zlib.compress(
                            sub.astype(">u2").tobytes(), 6))
            return pa.table({
                "key": pa.array(keys, pa.int64()),
                "z": pa.array(zs, pa.int32()),
                "tag": pa.array(tags, pa.int8()),
                "grid": pa.array(grids, pa.binary()),
            })
        return emit

    parts = [pan_tiles.map_batches(emit_pan, batch_format="pyarrow")]
    for i, bt in enumerate(band_tiles):
        parts.append(bt.map_batches(emit_band(i),
                                    batch_format="pyarrow"))
    emitted = parts[0].union(*parts[1:])

    def fuse(g: pa.Table) -> pa.Table:
        tags = g["tag"].to_numpy(zero_copy_only=False)
        pan_rows = np.flatnonzero(tags == -1)
        if len(pan_rows) == 0:
            # spectral quadrants without a pan tile produce no output
            return pa.table({"z": pa.array([], pa.int32()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             **{f"band_{i}": pa.array([], pa.binary())
                                for i in range(nb)}})
        r = int(pan_rows[0])
        key = int(g["key"][r].as_py())
        pan = np.frombuffer(zlib.decompress(g["grid"][r].as_py()),
                            dtype=">u2").reshape(TILE, TILE) \
            .astype(np.float64)
        ms = []
        for i in range(nb):
            rows = np.flatnonzero(tags == i)
            if len(rows):
                q = np.frombuffer(
                    zlib.decompress(g["grid"][int(rows[0])].as_py()),
                    dtype=">u2").reshape(HALF, HALF)
                up = np.repeat(np.repeat(q, 2, axis=0), 2, axis=1) \
                    .astype(np.float64)
            else:
                up = np.zeros((TILE, TILE))
            ms.append(up)
        pseudo = np.zeros((TILE, TILE))
        for i in range(nb):
            pseudo += w[i] * ms[i]
        factor = np.where(pseudo == 0.0, 0.0,
                          pan / np.where(pseudo == 0.0, 1.0, pseudo))
        cols = {"z": pa.array([int(g["z"][r].as_py())], pa.int32()),
                "x": pa.array([key >> 28], pa.int64()),
                "y": pa.array([key & ((1 << 28) - 1)], pa.int64())}
        for i in range(nb):
            out = (ms[i] * factor).astype("<f4")
            cols[f"band_{i}"] = pa.array(
                [zlib.compress(out.tobytes(), 6)], pa.binary())
        return pa.table(cols)

    return emitted.groupby("key").map_groups(fuse,
                                             batch_format="pyarrow")
