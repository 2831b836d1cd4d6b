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
