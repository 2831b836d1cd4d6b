"""Pipeline step registry — the `gdal vector pipeline` grammar analog.

The reference's CLI builds pipelines from named, argument-checked steps
(`GDALVectorPipelineAlgorithm::RegisterAlgorithms` registers ~40 steps,
apps/gdalalg_vector_pipeline.cpp:144-225; each step is TranslateFeature
for streaming ops or Process() for materializing ones,
apps/gdalvectorpipelinestepalgorithm.h:258-373).  Here a pipeline is a
JSON list of steps; each registered step is a function
``(ds, args) -> ds`` over a ``ray.data.Dataset`` — stateless steps are
``map_batches`` kernels, stateful ones actor pools, wide ones shuffles.

    [
      {"step": "read_parquet", "paths": "/data/pages", "columns": [...]},
      {"step": "where", "expr": "lang = 'en'"},
      {"step": "geotag"},
      {"step": "dedup", "key": "url", "order_col": "warc_ts"},
      {"step": "spatial_join", "polygons": "<parquet path>",
       "operation": "intersection"},
      {"step": "tile_counts", "zooms": [4, 6, 8]},
      {"step": "write_parquet", "path": "/out"}
    ]

Run with ``python -m gdal_ray.cli pipeline.json`` (the `ray job submit`
entry point: the script is the job payload).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

from ..stages._pool import autoscale as _autoscale

REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        REGISTRY[name] = fn
        return fn
    return deco


# --- sources ----------------------------------------------------------------


@register("read_parquet")
def _read_parquet(ds, args):
    import ray.data as rd

    kwargs = {}
    if args.get("columns"):
        kwargs["columns"] = list(args["columns"])
    if args.get("where"):
        from ..functions.expr import compile_where

        kwargs["filter"] = compile_where(args["where"])
    if args.get("parallelism"):
        kwargs["override_num_blocks"] = int(args["parallelism"])
    return rd.read_parquet(args["paths"], **kwargs)


@register("read_pages_fixture")
def _read_fixture(ds, args):
    import ray.data as rd

    from ..sources.pages import make_pages_table

    return rd.from_arrow(make_pages_table(0, int(args.get("rows", 1000))))


# --- per-batch steps ----------------------------------------------------------


@register("where")
def _where(ds, args):
    from ..functions.expr import compile_where

    expr = compile_where(args["expr"])
    return ds.map_batches(lambda b: b.filter(expr), batch_format="pyarrow")


@register("select")
def _select(ds, args):
    return ds.select_columns(list(args["columns"]))


@register("select_expr")
def _select_expr(ds, args):
    """SELECT-list projection with expressions — ``expr [AS alias],
    ...`` with scalar functions / CAST / arithmetic (swq select-expr
    evaluator; see functions/expr.py:compile_select)."""
    from ..functions.expr import select_batch

    sel = args["exprs"]
    return ds.map_batches(lambda b: select_batch(b, sel),
                          batch_format="pyarrow")


@register("rename")
def _rename(ds, args):
    mapping = dict(args["mapping"])
    return ds.map_batches(
        lambda b: b.rename_columns([mapping.get(c, c)
                                    for c in b.column_names]),
        batch_format="pyarrow")


@register("geotag")
def _geotag(ds, args):
    from ..functions.geotag import geotag_batch

    return ds.map_batches(
        lambda b: geotag_batch(
            b, cell_level=int(args.get("cell_level", 12)),
            prefix_level=int(args.get("prefix_level", 4))),
        batch_format="pyarrow")


@register("make_point")
def _make_point(ds, args):
    from ..functions.geotag import make_point_batch

    return ds.map_batches(
        lambda b: make_point_batch(b, args.get("x", "lon"),
                                   args.get("y", "lat")),
        batch_format="pyarrow")


@register("reproject")
def _reproject(ds, args):
    from ..geom.crs import Transformer

    src, dst = args.get("src", "EPSG:4326"), args["dst"]
    xc, yc = args.get("x", "lon"), args.get("y", "lat")
    ox, oy = args.get("out_x", "x_out"), args.get("out_y", "y_out")

    class Reproject:
        def __init__(self):
            self.t = Transformer.from_crs(src, dst)

        def __call__(self, b: pa.Table) -> pa.Table:
            import numpy as np

            X, Y, ok = self.t.transform_with_errors(
                b[xc].to_numpy(zero_copy_only=False),
                b[yc].to_numpy(zero_copy_only=False))
            out = b.append_column(ox, pa.array(X, pa.float64()))
            out = out.append_column(oy, pa.array(Y, pa.float64()))
            return out.append_column(ox + "_ok", pa.array(ok, pa.bool_()))

    return ds.map_batches(Reproject,
                          concurrency=_autoscale(args.get("concurrency")),
                          batch_format="pyarrow")


@register("buffer")
def _buffer(ds, args):
    from ..stages.geometry import buffer_batch

    return ds.map_batches(
        lambda b: buffer_batch(b, float(args["distance"]),
                               int(args.get("quadsegs", 30)),
                               args.get("col", "geometry")),
        batch_format="pyarrow")


@register("simplify")
def _simplify(ds, args):
    from ..stages.geometry import simplify_batch

    return ds.map_batches(
        lambda b: simplify_batch(b, float(args["tolerance"]),
                                 args.get("col", "geometry")),
        batch_format="pyarrow")


@register("swap_xy")
def _swap_xy(ds, args):
    from ..stages.geometry import swap_xy_batch

    return ds.map_batches(
        lambda b: swap_xy_batch(b, args.get("col", "geometry")),
        batch_format="pyarrow")


@register("explode_collections")
def _explode(ds, args):
    from ..stages.geometry import explode_collections

    return explode_collections(ds, args.get("col", "geometry"))


@register("check_geometry")
def _check_geometry(ds, args):
    from ..stages.geometry import check_geometry_batch

    return ds.map_batches(
        lambda b: check_geometry_batch(b, args.get("col", "geometry")),
        batch_format="pyarrow")


# --- stateful / wide steps ----------------------------------------------------


def _load_polygons(args) -> pa.Table:
    import pyarrow.parquet as pq

    if "polygons" in args:
        return pq.read_table(args["polygons"])
    if args.get("polygons_fixture") == "admin":
        from ..sources.pages import make_admin_polygons

        return make_admin_polygons(int(args.get("n_polygons", 1024)))
    from ..sources.pages import make_polygons_table

    return make_polygons_table()


@register("spatial_join")
def _spatial_join(ds, args):
    from ..stages.spatial_join import spatial_join

    return spatial_join(
        ds, _load_polygons(args),
        operation=args.get("operation", "intersection"),
        predicate=args.get("predicate", "intersects"),
        concurrency=args.get("concurrency"))


@register("dedup")
def _dedup(ds, args):
    from ..stages.dedup import dedup_exact

    return dedup_exact(ds, key=args.get("key", "url"),
                       order_col=args.get("order_col", "warc_ts"),
                       buckets=int(args.get("buckets", 256)))


@register("knn")
def _knn(ds, args):
    import pyarrow.parquet as pq

    from ..stages.knn import knn_lookup

    refs = pq.read_table(args["refs"])
    kw = {k: args[k] for k in ("radius", "value_col", "max_points",
                               "min_points", "power") if k in args}
    return knn_lookup(ds, refs, concurrency=args.get("concurrency"),
                      **kw)


@register("tile_counts")
def _tile_counts(ds, args):
    from ..stages.tiling import tile_counts

    return tile_counts(ds, list(args.get("zooms", [8])),
                       convention=args.get("convention", "xyz"),
                       profile=args.get("profile", "mercator"))


@register("pyramid")
def _pyramid(ds, args):
    from ..stages.tiling import pyramid_counts_ds

    return pyramid_counts_ds(ds, base_zoom=int(args["base_zoom"]),
                             min_zoom=int(args.get("min_zoom", 0)))


@register("render_tiles")
def _render_tiles(ds, args):
    from ..stages.tiling import render_tiles

    return render_tiles(ds, zoom=int(args["zoom"]),
                        convention=args.get("convention", "xyz"))


@register("groupby_agg")
def _groupby_agg(ds, args):
    from ..stages.aggregate import partial_final_agg

    aggs = [(a.get("col"), a["fn"], a["as"]) for a in args["aggs"]]
    return partial_final_agg(ds, args["keys"], aggs)


@register("sort")
def _sort(ds, args):
    keys = args["keys"] if isinstance(args["keys"], list) else [args["keys"]]
    desc = args.get("descending", False)
    return ds.sort(keys, descending=desc)


@register("limit")
def _limit(ds, args):
    return ds.limit(int(args["n"]))


@register("spatial_sort")
def _spatial_sort(ds, args):
    """Spatial sort (gdal vector sort): method 'hilbert' (the
    reference's default curve, gdalalg_vector_sort.cpp:351-375),
    'morton' (the engine's cell id), or 'strtree' (the STR leaf-packing
    order, gdalalg_vector_sort.cpp:393-500) as the sort key
    (SURVEY.md §2.6)."""
    import numpy as np

    from ..geom import cells as _cells

    level = int(args.get("level", 12))
    method = args.get("method", "hilbert")
    xcol, ycol = args.get("x", "lon"), args.get("y", "lat")

    if method == "strtree":
        return _strtree_sort(ds, xcol, ycol,
                             int(args.get("node_capacity", 10)))

    def add_key(b: pa.Table) -> pa.Table:
        lon = b[xcol].to_numpy(zero_copy_only=False)
        lat = b[ycol].to_numpy(zero_copy_only=False)
        if method == "hilbert":
            key = _cells.lonlat_to_hilbert(lon, lat, level).astype("uint64")
        elif method == "morton":
            key = _cells.lonlat_to_cell(lon, lat, level)
        else:
            raise ValueError(
                f"method must be hilbert|morton|strtree, got {method}")
        return b.append_column("spatial_key", pa.array(key, pa.uint64()))

    return ds.map_batches(add_key, batch_format="pyarrow") \
        .sort("spatial_key")


def _strtree_sort(ds, xcol: str, ycol: str, node_capacity: int = 10):
    """STR (sort-tile-recursive) leaf-packing order, distributed: the
    reference sorts by x, slices into ceil(sqrt(nleaves)) vertical
    strips, and orders each strip by y (gdalalg_vector_sort.cpp:
    393-500).  Here the strip boundaries come from x-quantiles of a
    driver-side sample (exact ranks are a global sort — the quantile
    strips reproduce them up to sampling error), then ONE distributed
    sort on the composite (strip, y) key."""
    import numpy as np

    n = ds.count()
    nleaf = max(1, int(np.ceil(n / node_capacity)))
    nstrips = max(1, int(np.ceil(np.sqrt(nleaf))))
    # seeded random sample across ALL blocks — a limit() prefix is not
    # a sample: on spatially-sorted input the strips would collapse
    frac = min(1.0, 65536 / max(n, 1))
    sample = ds.select_columns([xcol]).random_sample(frac, seed=7) \
        .limit(131072).to_pandas()[xcol].to_numpy()
    if len(sample) == 0:  # degenerate tiny-fraction draw
        sample = ds.select_columns([xcol]).limit(1024) \
            .to_pandas()[xcol].to_numpy()
    qs = np.quantile(np.sort(sample),
                     np.arange(1, nstrips) / nstrips) if nstrips > 1 \
        else np.empty(0)

    def add_key(b: pa.Table) -> pa.Table:
        x = b[xcol].to_numpy(zero_copy_only=False)
        y = b[ycol].to_numpy(zero_copy_only=False)
        strip = np.searchsorted(qs, x, side="right").astype(np.int64)
        return b.append_column(
            "strtree_strip", pa.array(strip)).append_column(
            "strtree_y", pa.array(y.astype(np.float64)))

    return ds.map_batches(add_key, batch_format="pyarrow") \
        .sort(["strtree_strip", "strtree_y"])


@register("contour")
def _contour(ds, args):
    """Tile table → marching-squares contour segments."""
    from ..stages.contour import contour_segments

    return contour_segments(ds, args["levels"])


@register("make_valid")
def _make_valid(ds, args):
    from ..stages.geometry import make_valid_batch

    return ds.map_batches(
        lambda b: make_valid_batch(b, col=args.get("geometry", "geometry")),
        batch_format="pyarrow")


@register("concave_hull")
def _concave_hull(ds, args):
    from ..stages.geometry import concave_hull_batch

    return ds.map_batches(
        lambda b: concave_hull_batch(b, alpha=float(args["alpha"]),
                                     col=args.get("geometry", "geometry")),
        batch_format="pyarrow")


@register("proximity")
def _proximity(ds, args):
    """Tile table → per-pixel distance-to-nearest-target raster
    (GDALComputeProximity, halo-exchange focal stage)."""
    from ..stages.focal import proximity

    return proximity(ds, maxdist=int(args.get("maxdist", 32)))


@register("fillnodata")
def _fillnodata(ds, args):
    """Tile table → nodata (zero) pixels filled by directional IDW
    (GDALFillNodata, halo-exchange focal stage)."""
    from ..stages.focal import fillnodata

    return fillnodata(ds, maxdist=int(args.get("maxdist", 32)))


@register("read_ipc")
def _read_ipc(ds, args):
    """Arrow IPC/Feather source (reference ogr/ogrsf_frmts/arrow)."""
    import glob as _glob

    import pyarrow.feather as _feather
    import ray.data as rd

    paths = args["paths"]
    files = sorted(_glob.glob(f"{paths}/*.arrow")) \
        if not isinstance(paths, list) else paths
    tables = [_feather.read_table(f) for f in (files or [paths])]
    return rd.from_arrow(tables)


@register("write_ipc")
def _write_ipc(ds, args):
    """Arrow IPC/Feather sink: one .arrow file per block (parallel,
    resumable layout like every engine sink)."""
    import os
    import uuid

    import pyarrow as _pa
    import pyarrow.feather as _feather

    path = args["path"]
    os.makedirs(path, exist_ok=True)

    def write_block(b: _pa.Table) -> _pa.Table:
        fn = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        tmp = fn + ".tmp"
        _feather.write_feather(b, tmp)
        os.replace(tmp, fn)
        return _pa.table({"path": _pa.array([fn]),
                          "rows": _pa.array([len(b)], _pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow")


@register("read_csv")
def _read_csv(ds, args):
    """CSV source (reference CSV driver ogr/ogrsf_frmts/csv) — Ray's
    native distributed reader."""
    import ray.data as rd

    return rd.read_csv(args["paths"])


@register("write_csv")
def _write_csv(ds, args):
    ds.write_csv(args["path"])
    return ds


@register("read_geojson")
def _read_geojson(ds, args):
    """GeoJSON FeatureCollection (small-layer) or GeoJSONSeq (scale
    path, newline-delimited) → Dataset with WKB geometry."""
    import ray.data as rd

    from ..sources.geojson import read_geojson, read_geojson_seq

    if args.get("seq"):
        return read_geojson_seq(args["paths"])
    return rd.from_arrow(read_geojson(args["path"]))


@register("write_geojson")
def _write_geojson(ds, args):
    """Dataset → newline-delimited GeoJSON part files."""
    from ..sources.geojson import write_geojson_seq

    return write_geojson_seq(ds, args["path"],
                             geometry_col=args.get("geometry", "geometry"))


@register("external")
def _external(ds, args):
    """External-command step (apps/gdalalg_external.cpp:57): spill the
    input Dataset to parquet, run the user command with {input}/{output}
    substituted, read the produced parquet back.  The exchange format
    is parquet (the reference uses GDAL-readable temporaries)."""
    import os
    import shutil
    import subprocess
    import tempfile

    import ray.data as rd

    workdir = tempfile.mkdtemp(prefix="gdal_ray_external_")
    in_dir = os.path.join(workdir, "input")
    out_dir = os.path.join(workdir, "output")
    os.makedirs(out_dir, exist_ok=True)
    try:
        ds.write_parquet(in_dir)
        cmd = args["command"].format(input=in_dir, output=out_dir)
        subprocess.run(cmd, shell=True, check=True)
        out = rd.read_parquet(out_dir).materialize()
    finally:
        if not args.get("keep_workdir"):
            shutil.rmtree(workdir, ignore_errors=True)
    return out


@register("color_map")
def _color_map(ds, args):
    """uint16 tile table → RGBA PNG tiles through a color ramp
    (gdal raster color-map + nodata-to-alpha)."""
    from ..stages.tiling import colormap_tiles

    stops = [(float(f), tuple(int(v) for v in rgb))
             for f, rgb in args.get(
                 "stops", [[0.0, [0, 0, 64]], [0.5, [32, 160, 64]],
                           [1.0, [255, 255, 192]]])]
    return colormap_tiles(ds, stops,
                          nodata_alpha=bool(args.get("nodata_alpha",
                                                     True)),
                          vmin=float(args.get("vmin", 0.0)),
                          vmax=args.get("vmax"))


@register("warp")
def _warp(ds, args):
    """Mercator tile table → plate-carrée tile table
    (ChunkAndWarpImage dataflow).  resampling: nearest (default) |
    bilinear | cubic | lanczos."""
    from ..stages.warp import warp_to_platecarree

    return warp_to_platecarree(
        ds, resampling=args.get("resampling", "nearest"))


@register("overviews")
def _overviews(ds, args):
    """Pixel-resampled overview pyramid (GenerateOverviewTile):
    base tiles → union of levels base_zoom-1 .. min_zoom; resampling:
    average (default) | nearest."""
    from ..stages.tiling import pyramid_overviews

    return pyramid_overviews(
        ds, base_zoom=int(args["base_zoom"]),
        min_zoom=int(args.get("min_zoom", 0)),
        resampling=args.get("resampling", "average"))


@register("sql")
def _sql(ds, args):
    """Run an OGR-SQL statement against the current dataset (table
    name ``input``; override with args['table'])."""
    import ray.data as rd

    from ..functions.sql import execute_sql

    out = execute_sql(args["query"], {args.get("table", "input"): ds})
    return rd.from_arrow(out) if isinstance(out, pa.Table) else out


@register("duckdb_batch")
def _duckdb_batch(ds, args):
    """Custom-SQL-dialect escape hatch (the OGR custom-dialect slot,
    doc/source/user/vector_data_model.rst ExecuteSQL dialects): run an
    arbitrary DuckDB SQL statement over EACH Arrow batch (table name
    ``batch``).  Semantics are explicitly PER-BATCH — row-local
    expressions, filters and enrichments of any DuckDB shape; global
    aggregates/joins belong in the engine's distributed steps (use the
    ``sql`` step).  The connection opens once per actor."""
    query = args["query"]
    batch_size = int(args.get("batch_size", 65536))

    class _DuckBatch:
        def __init__(self):
            import duckdb

            self.con = duckdb.connect()

        def __call__(self, batch: pa.Table) -> pa.Table:
            self.con.register("batch", batch)
            out = self.con.execute(query).arrow()
            self.con.unregister("batch")
            return out if isinstance(out, pa.Table) \
                else pa.table(out)

    from ..stages._pool import autoscale

    return ds.map_batches(_DuckBatch, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=autoscale(args.get("concurrency")))


@register("linearize")
def _linearize(ds, args):
    """Stroke curve geometries (CircularString/CompoundCurve/
    CurvePolygon/...) to linear types (getLinearGeometry, default 4°
    max angular step)."""
    from ..geom.curves import linearize_wkb

    col = args.get("geometry_col", "geometry")
    step = float(args.get("max_step_deg", 4.0))

    def f(b: pa.Table) -> pa.Table:
        out = pa.array([linearize_wkb(x, step)
                        for x in b[col].to_pylist()], pa.binary())
        return b.set_column(b.column_names.index(col), col, out)

    return ds.map_batches(f, batch_format="pyarrow")


@register("sieve")
def _sieve(ds, args):
    """Tile table → sieved tile table (GDALSieveFilter: same-value
    regions under threshold merge into their largest neighbor)."""
    from ..stages.sieve import sieve

    return sieve(ds, threshold=int(args["threshold"]),
                 protect_zero=bool(args.get("protect_zero", False)))


@register("dem")
def _dem(ds, args):
    """Tile table → gdaldem terrain product tiles (apps/
    gdaldem_lib.cpp).  ``product``: hillshade (az/alt args),
    hillshade_variants (combined/multidir/igor planes), slope_aspect
    (slope_deg/slope_pct/aspect planes), terrain (tri_riley/
    tri_wilson/tpi/roughness planes) or color_relief (ramp =
    [[value, r, g, b], ...])."""
    from ..stages import dem as _d

    product = args["product"]
    if product == "hillshade":
        return _d.hillshade(ds, az=float(args.get("az", 315.0)),
                            alt=float(args.get("alt", 45.0)))
    if product == "hillshade_variants":
        return _d.hillshade_variants(
            ds, az=float(args.get("az", 315.0)),
            alt=float(args.get("alt", 45.0)))
    if product == "slope_aspect":
        return _d.slope_aspect(ds)
    if product == "terrain":
        return _d.terrain_indices(ds)
    if product == "color_relief":
        ramp = [tuple(e) for e in args["ramp"]]
        return _d.color_relief(ds, ramp)
    raise ValueError(f"unknown dem product: {product!r}")


@register("viewshed")
def _viewshed(ds, args):
    """Tile table → per-observer visibility grids (gdal_viewshed,
    alg/viewshed/).  args: observers = [[obs_id, gx, gy], ...],
    max_dist, observer_z, target_height, mode."""
    from ..stages.viewshed import viewshed

    return viewshed(ds, [tuple(o) for o in args["observers"]],
                    int(args["max_dist"]),
                    observer_z=float(args.get("observer_z", 2.0)),
                    target_height=float(args.get("target_height", 0.0)),
                    mode=args.get("mode", "edge"))


@register("polygonize")
def _polygonize(ds, args):
    """Tile table → merged connected regions (raster→vector);
    connectedness 4 (default) or 8."""
    from ..stages.polygonize import polygonize_regions

    return polygonize_regions(
        ds, connectedness=int(args.get("connectedness", 4)))


@register("mosaic")
def _mosaic(ds, args):
    """Prioritized tile mosaic (gdalbuildvrt/gdal_merge): ds is the
    priority-0 source; args['others'] holds further tile Datasets
    (pipeline composition passes them programmatically); method
    'first'/'sum' or a list."""
    from ..stages.raster import mosaic_tiles

    return mosaic_tiles([ds] + list(args.get("others", [])),
                        method=args.get("method", "first"))


@register("crop")
def _crop(ds, args):
    """gdal_translate -srcwin window extraction with re-tiling."""
    from ..stages.raster import crop_tiles

    return crop_tiles(ds, int(args["cx0"]), int(args["cy0"]),
                      int(args["w"]), int(args["h"]))


@register("value_regions")
def _value_regions(ds, args):
    """Global value-equal region table (the contour -p / sieve
    accounting core)."""
    from ..stages.sieve import value_regions

    return value_regions(
        ds, driver_limit=int(args.get("driver_limit", 5_000_000)))


@register("line_locate")
def _line_locate(ds, args):
    """ogrlineref -get_pos: locate lon/lat rows along a polyline
    (args['line'] = [[x, y], ...])."""
    from ..stages.lineref import line_locate

    return line_locate(ds, [tuple(v) for v in args["line"]],
                       lon_col=args.get("lon", "lon"),
                       lat_col=args.get("lat", "lat"))


@register("zonal_extended")
def _zonal_extended(ds, args):
    from ..stages.zonal import zonal_extended

    return zonal_extended(ds, args["zone_col"], args["value_col"],
                          buckets=int(args.get("buckets", 64)))


@register("media_decode")
def _media_decode(ds, args):
    from ..stages.multimodal import decode_stage

    return decode_stage(ds, media_col=args.get("col", "media"),
                        concurrency=args.get("concurrency"),
                        batch_size=int(args.get("batch_size", 64)))


@register("media_features")
def _media_features(ds, args):
    from ..stages.multimodal import feature_stage

    return feature_stage(ds, dim=int(args.get("dim", 64)),
                         concurrency=args.get("concurrency"))


@register("media_frame_sample")
def _media_frames(ds, args):
    from ..stages.multimodal import frame_sample_stage

    return frame_sample_stage(ds, media_col=args.get("col", "media"),
                              n_frames=int(args.get("n_frames", 4)),
                              key_col=args.get("key", "url"))


# --- sinks --------------------------------------------------------------------


@register("write_parquet")
def _write_parquet(ds, args):
    ds.write_parquet(args["path"])
    return ds


@register("write_partitioned")
def _write_partitioned(ds, args):
    from ..sources.manifest import write_partitioned

    return write_partitioned(ds, args["path"], args["partition_col"],
                             resume=bool(args.get("resume", True)))


# --- runner -------------------------------------------------------------------


def run_pipeline(spec: list[dict[str, Any]]):
    """Execute a JSON pipeline spec; returns the final Dataset."""
    if not spec:
        raise ValueError("empty pipeline")
    # validate the whole spec BEFORE executing anything (the reference
    # parses/validates all steps before Run, gdalalg_abstract_pipeline.h)
    for i, step in enumerate(spec):
        name = step.get("step")
        if name not in REGISTRY:
            raise ValueError(f"unknown step {name!r}; known: "
                             f"{sorted(REGISTRY)}")
        if i == 0 and not name.startswith("read_"):
            raise ValueError("pipeline must start with a read_* step")
    ds = None
    for step in spec:
        ds = REGISTRY[step["step"]](ds, step)
    return ds
