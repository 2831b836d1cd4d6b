"""Focal operators (proximity / fillnodata) — goldens vs single-array
brute force over the zero-padded mosaic (GDAL alg semantics)."""

import zlib

import numpy as np
import pytest

from gdal_ray.stages.focal import TILE, fillnodata, proximity


def _tile_row(z, x, y, grid):
    return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
            "raster": zlib.compress(grid.astype(">u2").tobytes(), 6)}


def _decode_f32(blob):
    return np.frombuffer(zlib.decompress(blob), dtype="<f4") \
        .reshape(TILE, TILE)


def _brute_proximity(mosaic, maxdist):
    ty, tx = np.nonzero(mosaic > 0)
    out = np.full(mosaic.shape, float(maxdist))
    if len(ty):
        yy, xx = np.mgrid[0:mosaic.shape[0], 0:mosaic.shape[1]]
        for r in range(mosaic.shape[0]):
            d2 = (xx[r][:, None] - tx[None, :]) ** 2 \
                + (r - ty[None, :]) ** 2
            out[r] = np.minimum(np.sqrt(d2.min(axis=1)), float(maxdist))
    return out


def test_proximity_matches_bruteforce_across_seams(ray_session):
    import ray.data as rd

    rs = np.random.RandomState(11)
    mosaic = np.zeros((2 * TILE, 2 * TILE), dtype=np.int64)
    pts = rs.randint(0, 2 * TILE, (25, 2))
    mosaic[pts[:, 0], pts[:, 1]] = 5
    # a target right at the seam so cross-tile distances matter
    mosaic[TILE - 1, TILE + 3] = 7
    rows = [_tile_row(4, 6 + tx, 9 + ty,
                      mosaic[ty * TILE:(ty + 1) * TILE,
                             tx * TILE:(tx + 1) * TILE])
            for tx in range(2) for ty in range(2)]
    maxdist = 24
    got = proximity(rd.from_items(rows), maxdist=maxdist).to_pandas()
    assert len(got) == 4
    ref = _brute_proximity(mosaic, maxdist)
    for _, r in got.iterrows():
        tx, ty = int(r["x"]) - 6, int(r["y"]) - 9
        sub = ref[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
        np.testing.assert_allclose(_decode_f32(r["raster_f32"]), sub,
                                   atol=1e-5)


def test_fillnodata_directional_idw(ray_session):
    import ray.data as rd

    grid = np.zeros((TILE, TILE), dtype=np.int64)
    grid[10, 10] = 8
    grid[10, 20] = 4
    out = fillnodata(rd.from_items([_tile_row(3, 2, 2, grid)]),
                     maxdist=16).to_pandas()
    f = _decode_f32(out["raster_f32"].iloc[0])
    # valid pixels unchanged
    assert f[10, 10] == 8.0 and f[10, 20] == 4.0
    # (10,15): left hit d=5 (v=8), right hit d=5 (v=4) -> mean 6
    assert f[10, 15] == pytest.approx(6.0, abs=1e-6)
    # (10,12): left d=2 (8), right d=8 (4): (8/2 + 4/8)/(1/2+1/8) = 7.2
    assert f[10, 12] == pytest.approx((8 / 2 + 4 / 8) / (0.5 + 0.125),
                                      abs=1e-5)
    # far away pixels stay 0
    assert f[200, 200] == 0.0


def test_proximity_multi_ring_halo(ray_session):
    """maxdist > TILE: the two-ring halo reaches targets two tiles
    away — exact match with the single-array brute force."""
    import ray.data as rd

    mosaic = np.zeros((3 * TILE, 3 * TILE), dtype=np.int64)
    mosaic[TILE // 2, TILE // 2] = 9  # one target in the NW tile
    rows = [_tile_row(5, tx, ty,
                      mosaic[ty * TILE:(ty + 1) * TILE,
                             tx * TILE:(tx + 1) * TILE])
            for tx in range(3) for ty in range(3)]
    maxdist = 300  # > TILE → 2 halo rings
    got = proximity(rd.from_items(rows), maxdist=maxdist).to_pandas()
    ref = _brute_proximity(mosaic, maxdist)
    for _, r in got.iterrows():
        tx, ty = int(r["x"]), int(r["y"])
        sub = ref[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
        np.testing.assert_allclose(_decode_f32(r["raster_f32"]), sub,
                                   atol=1e-4)
