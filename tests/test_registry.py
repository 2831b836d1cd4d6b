"""Pipeline registry + CLI spec tests (the gdal vector pipeline analog)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from gdal_ray.pipelines.registry import REGISTRY, run_pipeline
from gdal_ray.sources import pages as _pages


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("regpages")
    _pages.write_pages_parquet(str(d), 2000, rows_per_file=1000)
    return str(d)


def test_registry_covers_step_families():
    need = {"read_parquet", "where", "select", "geotag", "make_point",
            "reproject", "spatial_join", "dedup", "knn", "tile_counts",
            "pyramid", "render_tiles", "groupby_agg", "sort", "limit",
            "spatial_sort", "write_parquet", "write_partitioned",
            "buffer", "simplify", "swap_xy", "explode_collections",
            "check_geometry", "rename"}
    assert need <= set(REGISTRY)


def test_full_pipeline_spec(ray_session, pages_path, tmp_path):
    out = str(tmp_path / "tiles_out")
    spec = [
        {"step": "read_parquet", "paths": pages_path,
         "columns": ["url", "warc_ts", "text", "lang"]},
        {"step": "geotag"},
        {"step": "dedup", "key": "url", "order_col": "warc_ts"},
        {"step": "spatial_join", "operation": "intersection",
         "concurrency": 2},
        {"step": "tile_counts", "zooms": [5]},
        {"step": "write_partitioned", "path": out, "partition_col": "z"},
    ]
    res = run_pipeline(spec).to_pandas()
    assert res["rows"].sum() > 0
    t = pq.read_table(out + "/partition=5")
    assert t.num_rows == len(
        run_pipeline(spec[:5]).to_pandas())


def test_reproject_and_where_steps(ray_session, pages_path):
    spec = [
        {"step": "read_parquet", "paths": pages_path,
         "columns": ["url", "text", "lang"]},
        {"step": "where", "expr": "lang IN ('en','de')"},
        {"step": "geotag"},
        {"step": "reproject", "dst": "EPSG:3857",
         "out_x": "mx", "out_y": "my"},
        {"step": "select", "columns": ["url", "lon", "lat", "mx", "my"]},
        {"step": "limit", "n": 50},
    ]
    df = run_pipeline(spec).to_pandas()
    assert len(df) == 50
    from gdal_ray.geom import tiles

    ex, ey = tiles.lonlat_to_meters(df["lon"].values, df["lat"].values)
    np.testing.assert_allclose(df["mx"].values, ex)
    np.testing.assert_allclose(df["my"].values, ey)


def test_spatial_sort_orders_by_cell(ray_session, pages_path):
    spec = [
        {"step": "read_parquet", "paths": pages_path,
         "columns": ["url", "text"]},
        {"step": "geotag"},
        {"step": "spatial_sort", "level": 10},
    ]
    df = run_pipeline(spec).to_pandas()
    keys = df["spatial_key"].values.astype(np.uint64)
    assert (np.diff(keys.astype(np.float64)) >= 0).all()


def test_unknown_step_and_read_first():
    with pytest.raises(ValueError, match="unknown step"):
        run_pipeline([{"step": "read_parquet", "paths": "x"},
                      {"step": "nope"}])
    with pytest.raises(ValueError, match="must start with a read"):
        run_pipeline([{"step": "where", "expr": "a = 1"}])


def test_cli_main(ray_session, pages_path, tmp_path, capsys):
    import json

    from gdal_ray.cli import main

    spec = [
        {"step": "read_parquet", "paths": pages_path,
         "columns": ["url", "lang"]},
        {"step": "where", "expr": "lang = 'zh'"},
        {"step": "limit", "n": 7},
    ]
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec))
    rc = main([str(p), "--show", "2"])
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.count("https://") == 2
    assert "# 7 rows" in out.err


def test_spatial_sort_strtree_leaf_order(ray_session):
    """STR packing order: x-strips, y-ordered within each strip —
    matching the exact-rank STRtree leaf order when the sample covers
    the whole layer (gdalalg_vector_sort.cpp:393-500 semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.registry import REGISTRY as STEPS

    rs = np.random.RandomState(4)
    n = 400
    t = pa.table({
        "pid": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(rs.uniform(-170, 170, n)),
        "lat": pa.array(rs.uniform(-80, 80, n)),
    })
    out = STEPS["spatial_sort"](rd.from_arrow(t).repartition(4),
                                {"method": "strtree"}).to_pandas()
    # within each strip, y is nondecreasing
    for _, grp in out.groupby("strtree_strip"):
        assert (np.diff(grp["lat"].to_numpy()) >= 0).all()
    # strips partition x: every strip's min x >= previous strip's max
    # modulo quantile-boundary ties
    stats = out.groupby("strtree_strip")["lon"].agg(["min", "max"])
    prev_max = -np.inf
    for _, row in stats.iterrows():
        assert row["min"] >= prev_max - 1e-9
        prev_max = row["max"]


def test_ipc_steps_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.registry import REGISTRY

    ds = rd.from_arrow(pa.table({"a": pa.array([7, 8, 9], pa.int64())}))
    out_dir = str(tmp_path / "ipc")
    res = REGISTRY["write_ipc"](ds, {"path": out_dir}).to_pandas()
    assert res["rows"].sum() == 3
    back = REGISTRY["read_ipc"](None, {"paths": out_dir}).to_pandas()
    assert sorted(back["a"]) == [7, 8, 9]


def test_registry_sql_linearize_overviews_steps(ray_session):
    import zlib
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from gdal_ray.geom import wkb as W
    from gdal_ray.pipelines.registry import REGISTRY

    # sql step over the current dataset
    ds = rd.from_items([{"a": 1, "b": "x"}, {"a": 5, "b": "y"},
                        {"a": 9, "b": "y"}])
    out = REGISTRY["sql"](ds, {"query":
                               "SELECT b, SUM(a) AS s FROM input "
                               "GROUP BY b ORDER BY b"})
    d = out.to_pandas()
    assert list(d["s"]) == [1, 14]

    # linearize step strokes a CircularString column
    cs = W.encode_circularstring([(2, 0), (0, 2), (-2, 0)])
    gds = rd.from_items([{"gid": 1, "geometry": cs}])
    lin = REGISTRY["linearize"](gds, {}).to_pandas()
    g = W.decode(lin["geometry"][0])
    assert g["type"] == "LineString" and len(g["coordinates"]) == 46

    # overviews step builds one average level
    grid = np.full((256, 256), 8, np.int64)
    tds = rd.from_items([{"z": 3, "x": 2, "y": 2, "n_pages": 1,
                          "raster": zlib.compress(
                              grid.astype(">u2").tobytes(), 6)}])
    ov = REGISTRY["overviews"](tds, {"base_zoom": 3, "min_zoom": 2}) \
        .to_pandas()
    assert list(ov["z"]) == [2]
    got = np.frombuffer(zlib.decompress(ov["raster"][0]),
                        dtype=">u2").reshape(256, 256)
    q = got[128:, :128]  # child (2,2) → quadrant (qx=0, qy=0)? check any
    assert got.max() == 8


def test_registry_json_pipeline_with_sql(ray_session):
    """End-to-end JSON pipeline: parquet read (predicate pushdown) →
    SQL statement → sort — the §2.10 declarative surface over the new
    executor."""
    from gdal_ray.pipelines.registry import run_pipeline

    spec = [
        {"step": "read_parquet",
         "paths": "/root/testdata/sf0.001/events.parquet",
         "columns": ["event_id", "event_type", "value"],
         "where": "value > 10.0"},
        {"step": "sql",
         "query": "SELECT event_type, COUNT(*) AS n, "
                  "SUM(CAST(event_id % 10 AS BIGINT)) AS s "
                  "FROM input GROUP BY event_type"},
        {"step": "sort", "keys": "event_type"},
    ]
    out = run_pipeline(spec).to_pandas()
    import duckdb
    con = duckdb.connect()
    want = con.execute(
        "SELECT event_type, COUNT(*) AS n, "
        "CAST(SUM(CAST(event_id % 10 AS BIGINT)) AS BIGINT) AS s "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet') "
        "WHERE value > 10.0 GROUP BY event_type ORDER BY event_type"
    ).fetchdf()
    assert list(out["event_type"]) == list(want["event_type"])
    assert list(out["n"].astype(int)) == list(want["n"].astype(int))
    assert list(out["s"].astype(int)) == list(want["s"].astype(int))


def test_duckdb_batch_step(ray_session):
    """Custom-SQL escape hatch: arbitrary DuckDB SQL per batch."""
    import ray.data as rd

    ds = rd.range(100).map_batches(
        lambda b: b.rename_columns(["v"]), batch_format="pyarrow") \
        .repartition(4)
    out = REGISTRY["duckdb_batch"](ds, {
        "query": "SELECT v, v * v AS sq, "
                 "CASE WHEN v % 2 = 0 THEN 'even' ELSE 'odd' END AS p "
                 "FROM batch WHERE v >= 10"}).to_pandas()
    assert len(out) == 90
    assert set(out.columns) == {"v", "sq", "p"}
    assert (out["sq"] == out["v"] ** 2).all()
    assert (out.loc[out["v"] % 2 == 0, "p"] == "even").all()


def test_registry_dem_step(ray_session):
    import zlib
    import numpy as np
    import ray.data as rd
    from gdal_ray.pipelines.registry import REGISTRY

    grid = np.zeros((256, 256), np.int64)
    grid[10, 10] = 16
    tds = rd.from_items([{"z": 3, "x": 2, "y": 2, "n_pages": 1,
                          "raster": zlib.compress(
                              grid.astype(">u2").tobytes(), 6)}])
    hs = REGISTRY["dem"](tds, {"product": "hillshade"}).to_pandas()
    g = np.frombuffer(zlib.decompress(hs["hillshade"][0]),
                      dtype="<f4").reshape(256, 256)
    flat = 1.0 + 254.0 * np.sin(np.radians(45.0))
    assert abs(g[100, 100] - flat) < 1e-4      # far field is flat
    assert abs(g[10, 9] - flat) > 1.0  # neighbors shade (the
    # spike center itself has zero Horn gradient: w4 unused)

    sa = REGISTRY["dem"](tds, {"product": "slope_aspect"}).to_pandas()
    assert {"slope_deg", "slope_pct", "aspect"} <= set(sa.columns)

    cr = REGISTRY["dem"](tds, {"product": "color_relief",
                               "ramp": [[0, 10, 20, 60],
                                        [16, 255, 255, 255]]}) \
        .to_pandas()
    r = np.frombuffer(zlib.decompress(cr["r"][0]),
                      dtype=np.uint8).reshape(256, 256)
    assert r[10, 10] == 255 and r[0, 0] == 10

    import pytest as _pt
    with _pt.raises(ValueError):
        REGISTRY["dem"](tds, {"product": "nope"})


def test_registry_r5_steps(ray_session):
    import zlib
    import numpy as np
    import ray.data as rd
    from gdal_ray.pipelines.registry import REGISTRY

    g = np.zeros((256, 256), np.int64)
    g[3, 3], g[3, 4] = 7, 7
    tds = rd.from_items([{"z": 3, "x": 0, "y": 0, "n_pages": 1,
                          "raster": zlib.compress(
                              g.astype(">u2").tobytes(), 6)}])
    # crop
    c = REGISTRY["crop"](tds, {"cx0": 2, "cy0": 2, "w": 10,
                               "h": 10}).to_pandas()
    got = np.frombuffer(zlib.decompress(c["raster"][0]),
                        dtype=">u2").reshape(256, 256)
    assert got[1, 1] == 7 and got[1, 2] == 7
    # value_regions
    vr = REGISTRY["value_regions"](tds, {}).to_pandas()
    assert int(vr[vr["value"] == 7]["size"].iloc[0]) == 2
    # mosaic with a second source
    g2 = np.zeros((256, 256), np.int64)
    g2[3, 3], g2[0, 0] = 9, 4
    t2 = rd.from_items([{"z": 3, "x": 0, "y": 0, "n_pages": 1,
                         "raster": zlib.compress(
                             g2.astype(">u2").tobytes(), 6)}])
    mo = REGISTRY["mosaic"](tds, {"others": [t2]}).to_pandas()
    gm = np.frombuffer(zlib.decompress(mo["raster"][0]),
                       dtype=">u2").reshape(256, 256)
    assert gm[3, 3] == 7 and gm[0, 0] == 4
    # line_locate
    pts = rd.from_items([{"lon": 1.0, "lat": 1.0}])
    ll = REGISTRY["line_locate"](
        pts, {"line": [[0.0, 0.0], [10.0, 0.0]]}).to_pandas()
    assert abs(ll["measure"][0] - 1.0) < 1e-12
    # polygonize with connectedness arg
    p8 = REGISTRY["polygonize"](tds, {"connectedness": 8}).to_pandas()
    assert len(p8) == 1
