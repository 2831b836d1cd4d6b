"""Warp (mercator → plate carrée) goldens: per-pixel nearest-neighbor
equality with a direct single-process recomputation."""

import zlib

import numpy as np

from gdal_ray.geom import tiles as _tiles
from gdal_ray.stages.warp import TILE, warp_to_platecarree


def _tile_row(z, x, y, grid):
    return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
            "raster": zlib.compress(grid.astype(">u2").tobytes(), 6)}


def _decode(blob):
    return np.frombuffer(zlib.decompress(blob), dtype=">u2") \
        .reshape(TILE, TILE).astype(np.int64)


def test_warp_matches_direct_resample(ray_session):
    import ray.data as rd

    z = 2
    rs = np.random.RandomState(6)
    src = {}
    rows = []
    for x, y in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        g = rs.randint(0, 100, (TILE, TILE))
        src[(x, y)] = g
        rows.append(_tile_row(z, x, y, g))
    out = warp_to_platecarree(rd.from_items(rows)).to_pandas()
    assert len(out) > 0
    n = 1 << z
    for _, r in out.iterrows():
        xo, yo = int(r["x"]), int(r["y"])
        got = _decode(r["raster"])
        lon = -180.0 + (xo + (np.arange(TILE) + 0.5) / TILE) * 360.0 / n
        lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / n
        lon2 = np.repeat(lon[None, :], TILE, axis=0)
        lat2 = np.repeat(lat[:, None], TILE, axis=1)
        expect = np.zeros((TILE, TILE), dtype=np.int64)
        inside = np.abs(lat2) <= _tiles.MAX_LATITUDE
        gx, gy = _tiles.global_pixel(lon2[inside], lat2[inside], z)
        vals = np.zeros(len(gx), dtype=np.int64)
        for i in range(len(gx)):
            g = src.get((int(gx[i] >> 8), int(gy[i] >> 8)))
            if g is not None:
                vals[i] = g[int(gy[i] & 255), int(gx[i] & 255)]
        expect[inside] = vals
        np.testing.assert_array_equal(got, expect)


def test_warp_value_presence(ray_session):
    """A marked source pixel appears in the output at its lat/lon."""
    import ray.data as rd

    z = 1
    g = np.zeros((TILE, TILE), np.int64)
    # near-equator pixel: plate-carrée output (0.35°/px) is FINER than
    # the source there (0.7°/px), so nearest-neighbor must hit it —
    # high-latitude isolated pixels can legitimately vanish under NN
    # downsampling (mercator pixels span ever fewer degrees poleward)
    g[255, 50] = 777  # mercator tile (0,0) at z1, bottom row ≈ lat 0+
    out = warp_to_platecarree(
        rd.from_items([_tile_row(z, 0, 0, g)])).to_pandas()
    found = any((_decode(r["raster"]) == 777).any()
                for _, r in out.iterrows())
    assert found


def test_warp_bilinear_matches_direct_lerp(ray_session):
    """Bilinear output == single-process 4-gather lerp recomputation,
    including cross-tile reads at source-tile seams (halo emission)."""
    import ray.data as rd

    z = 2
    npix = (1 << z) * TILE
    rs = np.random.RandomState(7)
    src = {}
    rows = []
    for x, y in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        g = rs.randint(0, 100, (TILE, TILE))
        src[(x, y)] = g
        rows.append(_tile_row(z, x, y, g))
    out = warp_to_platecarree(rd.from_items(rows),
                              resampling="bilinear").to_pandas()
    assert len(out) > 0

    def val_at(gx, gy):
        v = np.zeros(len(gx), dtype=np.float64)
        for i in range(len(gx)):
            g = src.get((int(gx[i] >> 8), int(gy[i] >> 8)))
            if g is not None:
                v[i] = g[int(gy[i] & 255), int(gx[i] & 255)]
        return v

    n = 1 << z
    for _, r in out.iterrows():
        xo, yo = int(r["x"]), int(r["y"])
        got = np.frombuffer(zlib.decompress(r["raster_f32"]),
                            dtype="<f4").reshape(TILE, TILE)
        lon = -180.0 + (xo + (np.arange(TILE) + 0.5) / TILE) * 360.0 / n
        lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / n
        lon2 = np.repeat(lon[None, :], TILE, axis=0).ravel()
        lat2 = np.repeat(lat[:, None], TILE, axis=1).ravel()
        inside = np.abs(lat2) <= _tiles.MAX_LATITUDE
        expect = np.zeros(TILE * TILE, dtype=np.float64)
        li, ai = lon2[inside], lat2[inside]
        gpx = (li + 180.0) / 360.0 * npix
        rr = np.radians(ai)
        gpy = (1.0 - np.log(np.tan(rr) + 1.0 / np.cos(rr)) / np.pi) \
            / 2.0 * npix
        fx, fy = gpx - 0.5, gpy - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        wx, wy = fx - x0, fy - y0
        # equal-zoom warp: dest lon grid aligns with source columns
        np.testing.assert_array_equal(wx, 0.0)
        x1 = np.minimum(x0 + 1, npix - 1)
        y1 = np.minimum(y0 + 1, npix - 1)
        x0 = np.maximum(x0, 0)
        y0 = np.maximum(y0, 0)
        expect[inside] = ((1 - wx) * (1 - wy) * val_at(x0, y0)
                          + wx * (1 - wy) * val_at(x1, y0)
                          + (1 - wx) * wy * val_at(x0, y1)
                          + wx * wy * val_at(x1, y1))
        np.testing.assert_allclose(
            got, expect.reshape(TILE, TILE).astype(np.float32), rtol=0,
            atol=0)


def test_warp_bilinear_seam_interpolation(ray_session):
    """A dest pixel between two source-tile rows lerps values from BOTH
    tiles — proves the halo ships the neighbor tile to the dest group."""
    import ray.data as rd

    z = 1
    top = np.zeros((TILE, TILE), np.int64)
    bot = np.zeros((TILE, TILE), np.int64)
    top[255, :] = 100  # last row of tile (0,0) — just north of lat 0
    bot[0, :] = 200    # first row of tile (0,1) — just south of lat 0
    out = warp_to_platecarree(
        rd.from_items([_tile_row(z, 0, 0, top), _tile_row(z, 0, 1, bot)]),
        resampling="bilinear").to_pandas()
    vals = set()
    for _, r in out.iterrows():
        g = np.frombuffer(zlib.decompress(r["raster_f32"]), dtype="<f4")
        vals.update(np.unique(np.round(g[g > 0], 3)).tolist())
    # strictly-between values exist only if both rows fed one lerp
    assert any(100.0 < v < 200.0 for v in vals), sorted(vals)[:10]


def test_warp_cubic_constant_field_and_overshoot(ray_session):
    """Cubic kernel weights sum to 1 — a constant mosaic warps to the
    same constant everywhere inside; a step edge overshoots (the
    Catmull-Rom signature bilinear can't produce)."""
    import ray.data as rd

    z = 1
    flat = np.full((TILE, TILE), 40, np.int64)
    rows = [_tile_row(z, x, y, flat) for x in (0, 1) for y in (0, 1)]
    out = warp_to_platecarree(rd.from_items(rows),
                              resampling="cubic").to_pandas()
    interior = []
    for _, r in out.iterrows():
        g = np.frombuffer(zlib.decompress(r["raster_f32"]),
                          dtype="<f4").reshape(TILE, TILE)
        # rows fully inside the mercator square and ≥2 src px from the
        # mosaic edge: cubic of a constant is exactly the constant
        yo = int(r["y"])
        lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / 2
        m = np.abs(lat) <= 80.0
        interior.append(g[m])
    inter = np.concatenate([a.ravel() for a in interior])
    np.testing.assert_allclose(inter, 40.0, atol=1e-4)

    # step edge along the equator: 0 (north tiles) → 100 (south tiles)
    hot = np.full((TILE, TILE), 100, np.int64)
    zero = np.zeros((TILE, TILE), np.int64)
    rows = [_tile_row(z, 0, 0, zero), _tile_row(z, 1, 0, zero),
            _tile_row(z, 0, 1, hot), _tile_row(z, 1, 1, hot)]
    out = warp_to_platecarree(rd.from_items(rows),
                              resampling="cubic").to_pandas()
    vmax = max(
        float(np.frombuffer(zlib.decompress(r["raster_f32"]),
                            dtype="<f4").max())
        for _, r in out.iterrows())
    assert vmax > 100.0 + 1e-3  # overshoot past the step


def test_warp_lanczos_constant_field(ray_session):
    """Normalized lanczos weights reproduce a constant field exactly
    (the normalization divides out the kernel sum); interior values
    match a direct 6-tap recompute."""
    import ray.data as rd

    z = 1
    flat = np.full((TILE, TILE), 40, np.int64)
    rows = [_tile_row(z, x, y, flat) for x in (0, 1) for y in (0, 1)]
    out = warp_to_platecarree(rd.from_items(rows),
                              resampling="lanczos").to_pandas()
    assert len(out) > 0
    vals = []
    for _, r in out.iterrows():
        g = np.frombuffer(zlib.decompress(r["raster_f32"]),
                          dtype="<f4").reshape(TILE, TILE)
        yo = int(r["y"])
        lat = 90.0 - (yo + (np.arange(TILE) + 0.5) / TILE) * 180.0 / 2
        m = np.abs(lat) <= 80.0
        vals.append(g[m])
    inter = np.concatenate([a.ravel() for a in vals])
    np.testing.assert_allclose(inter, 40.0, rtol=1e-6)


def test_warp_to_crs_matches_direct(ray_session):
    """CRS-general warp == single-process direct recomputation, for a
    UTM and a polar-stereo destination grid and all four kernels."""
    import ray.data as rd

    from gdal_ray.geom.crs import Transformer
    from gdal_ray.stages.warp import _resample2d, warp_to_crs

    z = 2
    rs = np.random.RandomState(9)
    src = {}
    rows = []
    for x in range(4):
        for y in range(4):
            g = rs.randint(0, 500, (TILE, TILE))
            src[(x, y)] = g
            rows.append(_tile_row(z, x, y, g))

    cases = [
        # UTM zone 31N: 512x512 px over ~Europe
        ("EPSG:32631", (-300000.0, 4000.0, 6500000.0, -4000.0, 512, 512),
         "bilinear"),
        ("EPSG:32631", (-300000.0, 4000.0, 6500000.0, -4000.0, 512, 512),
         "nearest"),
        # polar stereographic north around the pole (mercator-square
        # mask exercises the invalid/outside path)
        ("EPSG:3413", (-4800000.0, 18750.0, 4800000.0, -18750.0,
                       512, 512), "cubic"),
        ("EPSG:3413", (-4800000.0, 18750.0, 4800000.0, -18750.0,
                       512, 512), "lanczos"),
    ]
    for crs, grid, mode in cases:
        out = warp_to_crs(rd.from_items(rows), z, crs, grid,
                          resampling=mode).to_pandas()
        assert len(out) == 4, (crs, mode, len(out))
        tr = Transformer.from_crs(crs, 4326)
        x0, dx, y0, dy, W, H = grid
        for _, r in out.iterrows():
            txo, tyo = int(r["tx"]), int(r["ty"])
            col = "raster" if mode == "nearest" else "raster_f32"
            dt = ">u2" if mode == "nearest" else "<f4"
            got = np.frombuffer(zlib.decompress(r[col]), dtype=dt) \
                .reshape(TILE, TILE).astype(np.float64)
            cols = np.arange(TILE)
            X = x0 + (txo * TILE + cols + 0.5) * dx
            Y = y0 + (tyo * TILE + cols + 0.5) * dy
            X2 = np.repeat(X[None, :], TILE, axis=0).ravel()
            Y2 = np.repeat(Y[:, None], TILE, axis=1).ravel()
            lon, lat, ok = tr.transform_with_errors(X2, Y2)
            exp = _resample2d(lon, lat, ok, z, src, mode) \
                .reshape(TILE, TILE)
            if mode == "nearest":
                exp = np.clip(exp, 0, 65535).astype(">u2") \
                    .astype(np.float64)
            else:
                exp = exp.astype("<f4").astype(np.float64)
            np.testing.assert_array_equal(got, exp,
                                          err_msg=f"{crs} {mode}")


def test_warp_to_crs_identity_platecarree(ray_session):
    """EPSG:4326 dest grid at the plate-carrée tiling reproduces
    warp_to_platecarree's nearest output (two independent paths)."""
    import ray.data as rd

    from gdal_ray.stages.warp import warp_to_crs

    z = 1
    rs = np.random.RandomState(3)
    rows = []
    for x in range(2):
        for y in range(2):
            rows.append(_tile_row(z, x, y,
                                  rs.randint(0, 90, (TILE, TILE))))
    a = warp_to_platecarree(rd.from_items(rows)).to_pandas()
    grid = (-180.0, 360.0 / 512, 90.0, -180.0 / 512, 512, 512)
    b = warp_to_crs(rd.from_items(rows), z, "EPSG:4326", grid).to_pandas()
    am = {(int(r["x"]), int(r["y"])): _decode(r["raster"])
          for _, r in a.iterrows()}
    bm = {(int(r["tx"]), int(r["ty"])): _decode(r["raster"])
          for _, r in b.iterrows()}
    for k in am:
        np.testing.assert_array_equal(am[k], bm[k])
