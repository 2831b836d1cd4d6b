"""Sieve filter goldens — GDALSieveFilter semantics (small same-value
regions merge into their largest neighbor, smallest first), including
cross-tile region size accounting."""

import zlib

import numpy as np

from gdal_ray.stages.sieve import TILE, sieve


def _tile_row(z, x, y, grid):
    return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
            "raster": zlib.compress(grid.astype(">u2").tobytes(), 6)}


def _decode(blob):
    return np.frombuffer(zlib.decompress(blob), dtype=">u2") \
        .reshape(TILE, TILE)


def test_sieve_small_island_into_largest_neighbor(ray_session):
    import ray.data as rd

    g = np.full((TILE, TILE), 3, dtype=np.int64)
    g[10:12, 10:12] = 7       # 4 px island → sieved into the 3-field
    g[100:150, 100:150] = 9   # 2500 px → survives
    out = sieve(rd.from_items([_tile_row(2, 1, 1, g)]),
                threshold=10).to_pandas()
    ng = _decode(out["raster"].iloc[0])
    assert (ng[10:12, 10:12] == 3).all()
    assert (ng[100:150, 100:150] == 9).all()
    assert (ng[g == 3] == 3).all()


def test_sieve_cross_tile_region_size(ray_session):
    """A region split 3+3 px across two tiles counts as 6: survives
    threshold 5, sieved at threshold 7."""
    import ray.data as rd

    ga = np.zeros((TILE, TILE), np.int64)
    gb = np.zeros((TILE, TILE), np.int64)
    ga[50, TILE - 3:] = 5
    gb[50, :3] = 5
    rows = [_tile_row(2, 1, 1, ga), _tile_row(2, 2, 1, gb)]
    keep = sieve(rd.from_items(rows), threshold=5).to_pandas() \
        .sort_values("x")
    assert (_decode(keep["raster"].iloc[0])[50, TILE - 3:] == 5).all()
    gone = sieve(rd.from_items(rows), threshold=7).to_pandas() \
        .sort_values("x")
    assert (_decode(gone["raster"].iloc[0])[50, TILE - 3:] == 0).all()
    assert (_decode(gone["raster"].iloc[1])[50, :3] == 0).all()


def test_sieve_small_regions_absorbed_by_largest_neighbor(ray_session):
    """Largest-NEIGHBOR rule: two small adjacent regions both border
    the giant background, so both merge into value 0 — not into each
    other (the reference's merge target is the biggest neighbor, not
    the nearest small one)."""
    import ray.data as rd

    g = np.zeros((TILE, TILE), np.int64)
    g[0:2, 0:4] = 2    # 8 px of value 2
    g[2:4, 0:4] = 6    # 8 px of value 6, adjacent below
    out = sieve(rd.from_items([_tile_row(2, 1, 1, g)]),
                threshold=10).to_pandas()
    ng = _decode(out["raster"].iloc[0])
    assert (ng == 0).all()


def test_sieve_enclosed_cascade(ray_session):
    """An island enclosed INSIDE another region merges into its only
    neighbor (the ring), growing it past the threshold."""
    import ray.data as rd

    g = np.zeros((TILE, TILE), np.int64)
    g[10:16, 10:16] = 4          # 36 px ring region of value 4
    g[12:14, 12:14] = 8          # 4 px island of 8 enclosed in the 4s
    out = sieve(rd.from_items([_tile_row(2, 1, 1, g)]),
                threshold=6).to_pandas()
    ng = _decode(out["raster"].iloc[0])
    # island (4 px < 6) merges into the enclosing 4-region (its only
    # neighbor is larger); the 4-region (32 px) stays
    assert (ng[12:14, 12:14] == 4).all()
    assert (ng[10:16, 10:16] == 4).all()


def test_sieve_world_top_edge_regions_stay_separate(ray_session):
    """Two sub-threshold regions touching global row 0 in NON-adjacent
    y=0 tiles must not chain through the out-of-world seam key
    (gy0-1 == -1 collapses to one key without the guard): each is 3 px
    < threshold 5, so both sieve away; a spurious 6-px merge would
    survive (ADVICE round 2)."""
    import ray.data as rd

    ga = np.zeros((TILE, TILE), np.int64)
    gb = np.zeros((TILE, TILE), np.int64)
    ga[0, 10:13] = 5
    gb[0, 40:43] = 5
    rows = [_tile_row(5, 0, 0, ga), _tile_row(5, 2, 0, gb)]
    out = sieve(rd.from_items(rows), threshold=5).to_pandas() \
        .sort_values("x")
    assert (_decode(out["raster"].iloc[0])[0, 10:13] == 0).all()
    assert (_decode(out["raster"].iloc[1])[0, 40:43] == 0).all()


def test_sieve_dispatch_paths_agree(ray_session):
    """driver_limit=0 forces the distributed region accounting; output
    rasters must be byte-identical to the driver-vectorized path on a
    cross-tile + cascade fixture."""
    import ray.data as rd

    rs = np.random.RandomState(31)
    ga = np.zeros((TILE, TILE), np.int64)
    gb = np.zeros((TILE, TILE), np.int64)
    ga[rs.randint(0, TILE, 300), rs.randint(0, TILE, 300)] = \
        rs.randint(1, 5, 300)
    gb[rs.randint(0, TILE, 300), rs.randint(0, TILE, 300)] = \
        rs.randint(1, 5, 300)
    ga[50, TILE - 3:] = 5
    gb[50, :3] = 5
    rows = [_tile_row(2, 1, 1, ga), _tile_row(2, 2, 1, gb)]
    for th in (3, 7):
        a = sieve(rd.from_items(rows), threshold=th).to_pandas() \
            .sort_values(["x", "y"]).reset_index(drop=True)
        b = sieve(rd.from_items(rows), threshold=th,
                  driver_limit=0).to_pandas() \
            .sort_values(["x", "y"]).reset_index(drop=True)
        for i in range(len(a)):
            np.testing.assert_array_equal(_decode(a["raster"][i]),
                                          _decode(b["raster"][i]))


def test_value_regions_cross_seam(ray_session):
    import zlib
    import numpy as np
    import ray.data as rd
    from gdal_ray.stages.sieve import value_regions

    # two tiles side by side; a value-7 bar crosses the seam, a
    # value-7 island sits apart, value-3 fills one corner
    left = np.zeros((256, 256), np.int64)
    right = np.zeros((256, 256), np.int64)
    left[100, 250:] = 7
    right[100, :6] = 7
    right[10:12, 10:12] = 7
    left[:4, :4] = 3
    rows = [{"z": 4, "x": 2, "y": 3, "n_pages": 1,
             "raster": zlib.compress(left.astype(">u2").tobytes(), 6)},
            {"z": 4, "x": 3, "y": 3, "n_pages": 1,
             "raster": zlib.compress(right.astype(">u2").tobytes(), 6)}]
    out = value_regions(rd.from_items(rows)).to_pandas()
    sevens = out[out["value"] == 7].sort_values("size")
    assert list(sevens["size"]) == [4, 12]   # island, merged bar
    assert len(out[out["value"] == 3]) == 1
    assert int(out[out["value"] == 3]["size"].iloc[0]) == 16
    # forcing the distributed path gives identical regions
    out2 = value_regions(rd.from_items(rows), driver_limit=0) \
        .to_pandas()
    a = out.sort_values(["value", "size", "region"]).reset_index(
        drop=True)
    b = out2.sort_values(["value", "size", "region"]).reset_index(
        drop=True)
    assert a[["region", "size", "value"]].equals(
        b[["region", "size", "value"]])
