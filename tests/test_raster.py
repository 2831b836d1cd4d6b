"""Raster-operator tests over the tile table (stages.raster)."""

import numpy as np
import pyarrow as pa
import pytest
import zlib

from gdal_ray.geom import tiles as _tiles
from gdal_ray.stages import raster as _raster
from gdal_ray.stages import tiling as _tiling


def _points_ds(ray_session, n=400, seed=21):
    import ray.data as rd

    rs = np.random.RandomState(seed)
    return rd.from_arrow(pa.table({
        "pid": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(rs.uniform(-170, 170, n)),
        "lat": pa.array(rs.uniform(-80, 80, n)),
    })).repartition(4)


def test_pixel_identity_z_plus_8():
    """Pixel (px,py) of XYZ tile at z == tile index at z+8."""
    rs = np.random.RandomState(5)
    lon = rs.uniform(-179.9, 179.9, 50000)
    lat = rs.uniform(-84.9, 84.9, 50000)
    tx, ty, px, py = _tiles.tile_pixel(lon, lat, 4, "xyz")
    gx, gy = _tiles.lonlat_to_tile(lon, lat, 12, "xyz")
    np.testing.assert_array_equal(tx * 256 + px, gx)
    np.testing.assert_array_equal(ty * 256 + py, gy)


def test_pixels_as_features_conserves_counts(ray_session):
    ds = _points_ds(ray_session)
    tiles_ds = _tiling.render_tiles(ds, zoom=2)
    feats = _raster.pixels_as_features(tiles_ds).to_pandas()
    assert feats["n"].sum() == 400
    assert ((feats["px"] >= 0) & (feats["px"] < 256)).all()
    assert (feats["n"] >= 1).all()


def test_value_at_points_nearest_self_count(ray_session):
    import ray

    ds = _points_ds(ray_session)
    tiles_t = pa.concat_tables(
        [b for b in _tiling.render_tiles(ds, zoom=2).iter_batches(
            batch_size=65536, batch_format="pyarrow") if len(b)])
    out = _raster.value_at_points(ds, tiles_t, zoom=2,
                                  method="nearest").to_pandas()
    # every point samples its own pixel → value >= 1
    assert (out["raster_value"] >= 1).all()


def test_value_at_points_bilinear_smooths(ray_session):
    import ray

    ds = _points_ds(ray_session, n=100)
    tiles_t = pa.concat_tables(
        [b for b in _tiling.render_tiles(ds, zoom=2).iter_batches(
            batch_size=65536, batch_format="pyarrow") if len(b)])
    out = _raster.value_at_points(ds, tiles_t, zoom=2,
                                  method="bilinear").to_pandas()
    assert (out["raster_value"] > 0).all()
    # bilinear of a nonneg field is bounded by 4x the max pixel value
    grid_max = max(
        np.frombuffer(zlib.decompress(b), dtype=">u2").max()
        for b in tiles_t["raster"].to_pylist())
    assert (out["raster_value"] <= float(grid_max)).all()


def test_raster_calc_log1p(ray_session):
    ds = _points_ds(ray_session)
    tiles_ds = _tiling.render_tiles(ds, zoom=2)
    calc = _raster.raster_calc(tiles_ds, np.log1p).to_pandas()
    assert "raster" not in calc.columns  # uint16 consumers fail loudly
    for _, row in calc.head(3).iterrows():
        g = _raster.decode_grid_f32(row["raster_f32"])
        assert np.isfinite(g).all() and g.max() <= np.log1p(65535)


def test_band_stats(ray_session):
    ds = _points_ds(ray_session)
    tiles_ds = _tiling.render_tiles(ds, zoom=2)
    st = _raster.band_stats(tiles_ds)
    assert st["sum"] == 400
    assert st["min"] == 0 and st["max"] >= 1
    assert st["n_pixels"] == st["n_tiles"] * 65536
    assert st["mean"] == pytest.approx(400 / st["n_pixels"])


def test_overview_level_average_and_nearest(ray_session):
    """overview_level: parent quadrants hold the 2×2 round-half-up
    average (or top-left pixel) of each child tile's grid."""
    import zlib
    import ray.data as rd
    from gdal_ray.stages.tiling import TILE_SIZE, overview_level

    rs = np.random.RandomState(11)
    rows, grids = [], {}
    for x, y in [(2, 2), (3, 2), (2, 3)]:  # one quadrant missing
        g = rs.randint(0, 1000, (TILE_SIZE, TILE_SIZE))
        grids[(x, y)] = g
        rows.append({"z": 4, "x": x, "y": y, "n_pages": int(g.sum()),
                     "raster": zlib.compress(
                         g.astype(">u2").tobytes(), 6)})
    for resampling in ("average", "nearest"):
        out = overview_level(rd.from_items(rows),
                             resampling=resampling).to_pandas()
        assert list(out["z"]) == [3] and len(out) == 1
        assert (int(out["x"][0]), int(out["y"][0])) == (1, 1)
        got = np.frombuffer(zlib.decompress(out["raster"][0]),
                            dtype=">u2").reshape(TILE_SIZE, TILE_SIZE) \
            .astype(np.int64)
        h = TILE_SIZE // 2
        expect = np.zeros((TILE_SIZE, TILE_SIZE), np.int64)
        for (x, y), g in grids.items():
            if resampling == "average":
                s = (g[0::2, 0::2] + g[0::2, 1::2]
                     + g[1::2, 0::2] + g[1::2, 1::2])
                d = (s + 2) >> 2
            else:
                d = g[0::2, 0::2]
            expect[(y & 1) * h:(y & 1) * h + h,
                   (x & 1) * h:(x & 1) * h + h] = d
        np.testing.assert_array_equal(got, expect)


def test_pansharpen_weighted_brovey(ray_session):
    import zlib
    import numpy as np
    import ray.data as rd
    from gdal_ray.stages.pansharpen import pansharpen

    def tile_row(z, x, y, grid):
        return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
                "raster": zlib.compress(grid.astype(">u2").tobytes(),
                                        6)}

    rs = np.random.RandomState(5)
    pan = rs.randint(0, 9, (256, 256)).astype(np.int64)
    b0 = rs.randint(0, 5, (256, 256)).astype(np.int64)
    b1 = rs.randint(0, 5, (256, 256)).astype(np.int64)
    # pan tile (z3, 5, 3) is the (qx=1, qy=1) child of z2 tile (2, 1)
    pan_ds = rd.from_items([tile_row(3, 5, 3, pan)])
    b0_ds = rd.from_items([tile_row(2, 2, 1, b0)])
    b1_ds = rd.from_items([tile_row(2, 2, 1, b1)])
    out = pansharpen(pan_ds, [b0_ds, b1_ds], [0.7, 0.3]).to_pandas()
    assert len(out) == 1 and int(out["x"][0]) == 5

    up0 = np.repeat(np.repeat(b0[128:, 128:], 2, 0), 2, 1) \
        .astype(float)
    up1 = np.repeat(np.repeat(b1[128:, 128:], 2, 0), 2, 1) \
        .astype(float)
    pseudo = 0.7 * up0 + 0.3 * up1
    factor = np.where(pseudo == 0, 0.0,
                      pan / np.where(pseudo == 0, 1.0, pseudo))
    for i, up in ((0, up0), (1, up1)):
        got = np.frombuffer(zlib.decompress(out[f"band_{i}"][0]),
                            dtype="<f4").reshape(256, 256)
        np.testing.assert_allclose(got, (up * factor), rtol=1e-6)

    # a pan tile with NO spectral coverage: all-zero output
    pan2 = rd.from_items([tile_row(3, 9, 9, pan)])
    out2 = pansharpen(pan2, [b0_ds, b1_ds], [0.7, 0.3]).to_pandas()
    row = out2[out2["x"] == 9].iloc[0]
    g = np.frombuffer(zlib.decompress(row["band_0"]), dtype="<f4")
    assert (g == 0).all()


def test_mosaic_tiles_first_and_sum(ray_session):
    import zlib
    import numpy as np
    import ray.data as rd
    from gdal_ray.stages.raster import mosaic_tiles

    def tile_row(z, x, y, grid):
        return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
                "raster": zlib.compress(grid.astype(">u2").tobytes(),
                                        6)}

    a = np.zeros((256, 256), np.int64)
    b = np.zeros((256, 256), np.int64)
    a[0, 0], a[0, 1] = 5, 0
    b[0, 0], b[0, 1], b[0, 2] = 9, 7, 3
    s0 = rd.from_items([tile_row(3, 1, 1, a)])
    s1 = rd.from_items([tile_row(3, 1, 1, b),
                        tile_row(3, 2, 2, b)])  # only in source 1
    first = mosaic_tiles([s0, s1], "first").to_pandas() \
        .set_index(["x", "y"])
    summed = mosaic_tiles([s0, s1], "sum").to_pandas() \
        .set_index(["x", "y"])

    g = np.frombuffer(zlib.decompress(first.loc[(1, 1), "raster"]),
                      dtype=">u2").reshape(256, 256)
    assert g[0, 0] == 5        # source 0 wins where nonzero
    assert g[0, 1] == 7        # source 1 fills the zero pixel
    assert g[0, 2] == 3
    g2 = np.frombuffer(zlib.decompress(first.loc[(2, 2), "raster"]),
                       dtype=">u2").reshape(256, 256)
    assert g2[0, 0] == 9       # tile only in source 1
    gs = np.frombuffer(zlib.decompress(summed.loc[(1, 1), "raster"]),
                       dtype=">u2").reshape(256, 256)
    assert gs[0, 0] == 14 and gs[0, 1] == 7


def test_crop_tiles_retiling(ray_session):
    import zlib
    import numpy as np
    import ray.data as rd
    from gdal_ray.stages.raster import crop_tiles

    def tile_row(z, x, y, grid):
        return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
                "raster": zlib.compress(grid.astype(">u2").tobytes(),
                                        6)}

    rs = np.random.RandomState(2)
    mosaic = rs.randint(0, 5, (512, 512)).astype(np.int64)
    rows = [tile_row(3, tx, ty, mosaic[ty * 256:(ty + 1) * 256,
                                       tx * 256:(tx + 1) * 256])
            for tx in range(2) for ty in range(2)]
    cx0, cy0, w, h = 100, 37, 300, 400
    out = crop_tiles(rd.from_items(rows), cx0, cy0, w, h).to_pandas()
    win = mosaic[cy0:cy0 + h, cx0:cx0 + w]
    for _, r in out.iterrows():
        dtx, dty = int(r["x"]), int(r["y"])
        got = np.frombuffer(zlib.decompress(r["raster"]),
                            dtype=">u2").reshape(256, 256)
        exp = np.zeros((256, 256), np.int64)
        y0, x0 = dty * 256, dtx * 256
        sub = win[y0:min(y0 + 256, h), x0:min(x0 + 256, w)]
        exp[:sub.shape[0], :sub.shape[1]] = sub
        np.testing.assert_array_equal(got, exp, err_msg=f"{dtx},{dty}")
    # full coverage of the window
    assert sorted(map(tuple, out[["x", "y"]].values.tolist())) == \
        [(0, 0), (0, 1), (1, 0), (1, 1)]
