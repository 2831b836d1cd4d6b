"""Dataset-level geometry steps — `gdal vector <op>` analogs.

Each function is a thin ``map_batches`` wrapper over the pure kernels in
``geom.ops``; geometry stays WKB bytes in Arrow binary columns (the
ogc.wkb convention of the reference's Arrow bridge).  Scalar-per-
geometry kernels run inside the batch loop — geometry columns here are
method layers / derived shapes (thousands of rows), not the page-scale
hot path, matching the reference where these are per-feature pipeline
steps (apps/gdalalg_vector_*.cpp)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import ops as _ops


def _map_geom_col(batch: pa.Table, col: str, fn, out_col: str | None = None,
                  out_type=pa.binary()) -> pa.Table:
    blobs = batch[col].to_pylist()
    vals = [fn(b) for b in blobs]
    arr = pa.array(vals, out_type)
    if out_col is None or out_col == col:
        i = batch.column_names.index(col)
        return batch.set_column(i, col, arr)
    return batch.append_column(out_col, arr)


def area_batch(batch: pa.Table, col: str = "geometry",
               out: str = "area") -> pa.Table:
    """OGR_GEOM_AREA special field (ogr/ogr_p.h:134-140)."""
    return _map_geom_col(batch, col, _ops.wkb_area, out, pa.float64())


def centroid_batch(batch: pa.Table, col: str = "geometry") -> pa.Table:
    """Append centroid_x/centroid_y (OGRGeometry::Centroid,
    ogr/ogrgeometry.cpp:6526)."""
    cents = [_ops.wkb_centroid(b) for b in batch[col].to_pylist()]
    out = batch.append_column(
        "centroid_x", pa.array([c[0] for c in cents], pa.float64()))
    return out.append_column(
        "centroid_y", pa.array([c[1] for c in cents], pa.float64()))


def convex_hull_batch(batch: pa.Table, col: str = "geometry") -> pa.Table:
    """gdal vector convex-hull."""
    return _map_geom_col(batch, col, _ops.wkb_convex_hull)


def simplify_batch(batch: pa.Table, tolerance: float,
                   col: str = "geometry") -> pa.Table:
    """gdal vector simplify (GEOS Simplify / Douglas-Peucker)."""
    return _map_geom_col(batch, col,
                         lambda b: _ops.wkb_simplify(b, tolerance))


def segmentize_batch(batch: pa.Table, max_length: float,
                     col: str = "geometry") -> pa.Table:
    """gdal vector segmentize."""
    return _map_geom_col(batch, col,
                         lambda b: _ops.wkb_segmentize(b, max_length))


def swap_xy_batch(batch: pa.Table, col: str = "geometry") -> pa.Table:
    """gdal vector swap-xy."""
    return _map_geom_col(batch, col, _ops.wkb_swap_xy)


def buffer_batch(batch: pa.Table, distance: float, quadsegs: int = 30,
                 col: str = "geometry") -> pa.Table:
    """gdal vector buffer (point geometries)."""
    return _map_geom_col(batch, col,
                         lambda b: _ops.wkb_buffer(b, distance, quadsegs))


def check_geometry_batch(batch: pa.Table, col: str = "geometry",
                         out: str = "is_valid") -> pa.Table:
    """gdal vector check-geometry (diagnostics column)."""
    return _map_geom_col(batch, col, _ops.wkb_is_valid, out, pa.bool_())


def explode_collections(ds, col: str = "geometry"):
    """gdal vector explode-collections: one row per part (flat_map
    shape, expressed columnar per batch)."""
    def expand(batch: pa.Table) -> pa.Table:
        blobs = batch[col].to_pylist()
        parts = [_ops.explode_parts(b) for b in blobs]
        counts = [len(p) for p in parts]
        idx = np.repeat(np.arange(len(blobs), dtype=np.int64), counts)
        flat = [g for ps in parts for g in ps]
        i = batch.column_names.index(col)
        out = batch.take(pa.array(idx))
        return out.set_column(i, col, pa.array(flat, pa.binary()))

    return ds.map_batches(expand, batch_format="pyarrow")


def make_valid_batch(batch: pa.Table, col: str = "geometry") -> pa.Table:
    """gdal vector make-valid (STRUCTURE subset: ring closure, dup
    vertices, winding; see geom.ops.wkb_make_valid)."""
    return _map_geom_col(batch, col, _ops.wkb_make_valid)


def concave_hull_batch(batch: pa.Table, alpha: float,
                       col: str = "geometry") -> pa.Table:
    """gdal vector concave-hull — alpha-shape variant over the
    feature's vertices (geom.ops.wkb_concave_hull)."""
    return _map_geom_col(batch, col,
                         lambda b: _ops.wkb_concave_hull(b, alpha))
