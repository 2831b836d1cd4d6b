"""Geotagging kernel — the engine's `make-point` step.

The analog of ``gdal vector make-point`` (apps/gdalalg_vector_make_point.cpp:
build a point geometry from coordinate columns) fused with the payload
extraction the input_hint requires: pages carry their coordinates inside
``text`` as ``geo:<lat>,<lon>``; this kernel extracts them with a
vectorized RE2 regex (pyarrow ``extract_regex`` — no Python per row),
builds the WKB point column, and attaches the hierarchical cell id and
its partition prefix.

All outputs are appended columns; input columns pass through untouched
(the per-url byte-identity invariant on ``text`` is preserved simply by
never rewriting the column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import cells, wkb

GEO_PATTERN = r"geo:(?P<lat>-?[0-9]+(?:\.[0-9]+)?),(?P<lon>-?[0-9]+(?:\.[0-9]+)?)"

DEFAULT_CELL_LEVEL = 12
DEFAULT_PREFIX_LEVEL = 4


def extract_latlon(text_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lat, lon, ok) from a string column; rows without a geotag get
    NaN coordinates and ok=False."""
    m = pc.extract_regex(text_col, GEO_PATTERN)
    ok = m.is_valid()
    lat = pc.cast(pc.struct_field(m, "lat"), pa.float64())
    lon = pc.cast(pc.struct_field(m, "lon"), pa.float64())
    lat_np = lat.to_numpy(zero_copy_only=False)
    lon_np = lon.to_numpy(zero_copy_only=False)
    return lat_np, lon_np, ok.to_numpy(zero_copy_only=False)


def geotag_batch(
    batch: pa.Table,
    text_col: str = "text",
    cell_level: int = DEFAULT_CELL_LEVEL,
    prefix_level: int = DEFAULT_PREFIX_LEVEL,
    with_geometry: bool = True,
    drop_untagged: bool = True,
) -> pa.Table:
    """Append lat, lon, (geometry,) cell, cell_prefix to a pages batch."""
    lat, lon, ok = extract_latlon(batch[text_col])
    if drop_untagged and not ok.all():
        batch = batch.filter(pa.array(ok))
        lat, lon = lat[ok], lon[ok]
    cell = cells.lonlat_to_cell(lon, np.nan_to_num(lat), cell_level)
    prefix = cells.cell_parent(cell, prefix_level)
    out = batch.append_column("lat", pa.array(lat, pa.float64()))
    out = out.append_column("lon", pa.array(lon, pa.float64()))
    if with_geometry:
        out = out.append_column(
            pa.field("geometry", pa.binary(), metadata=wkb.GEOMETRY_FIELD_METADATA),
            wkb.encode_points(lon, lat),
        )
    out = out.append_column("cell", pa.array(cell, pa.uint64()))
    out = out.append_column("cell_prefix", pa.array(prefix, pa.uint64()))
    return out


def make_point_batch(
    batch: pa.Table, x_col: str, y_col: str, out_col: str = "geometry"
) -> pa.Table:
    """Pure make-point from numeric columns (the reference step's exact
    semantics when coordinates are already columns)."""
    x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
    y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
    return batch.append_column(
        pa.field(out_col, pa.binary(), metadata=wkb.GEOMETRY_FIELD_METADATA),
        wkb.encode_points(x, y),
    )
