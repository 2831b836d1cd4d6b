"""GeoParquet metadata on Parquet vector files.

The reference's Parquet driver writes the GeoParquet ``geo``
file-level metadata key (ogr/ogrsf_frmts/parquet/
ogrparquetwriterlayer.cpp:576-690 GetGeoMetadata: version 1.1.0,
primary_column, per-column encoding / geometry_types / bbox; CRS
omitted for WGS84 by default) and readers detect geometry columns
from it (ogrparquetlayer.cpp:92-102).  This module reproduces that
contract over the engine's WKB binary geometry columns:

- ``geo_metadata``: build the JSON for a table (bbox + geometry_types
  scanned from the WKB).
- ``write_geoparquet``: one table → one .parquet with the ``geo`` key.
- ``write_geoparquet_dataset``: distributed — each Ray block attaches
  its OWN ``geo`` key (bbox of that file's content, which the spec
  allows as the per-file bbox) before ``write_parquet``.
- ``read_geoparquet``: read + parse/validate the metadata.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..geom import wkb as _wkb

GEOPARQUET_VERSION = "1.1.0"


def _collect_xy(g: dict, out: list) -> None:
    """Append every (n,2) coordinate array of a decoded geometry —
    recursive over Multi*/GeometryCollection/Curve parts so the bbox
    covers EVERY type decode() supports (a skipped type would silently
    under-cover the written per-file bbox)."""
    if "parts" in g:
        for p in g["parts"]:
            _collect_xy(p, out)
        return
    t, c = g["type"], g["coordinates"]
    if t == "Point":
        out.append(np.asarray([c], np.float64))
    elif t == "Polygon":
        out.extend(np.asarray(r, np.float64) for r in c)
    else:  # LineString / CircularString, plus Multi* without parts
        arr = np.asarray(c, np.float64)
        if arr.ndim == 2:
            out.append(arr)
        else:
            out.extend(np.asarray(r, np.float64) for r in c)


def _scan_column(col) -> tuple[list[str], list[float] | None]:
    """Geometry type names + [minx,miny,maxx,maxy] of a WKB column."""
    types: set[str] = set()
    minx = miny = np.inf
    maxx = maxy = -np.inf
    n = 0
    for blob in col.to_pylist():
        if blob is None:
            continue
        g = _wkb.decode(bytes(blob))
        types.add(g["type"])
        pieces: list = []
        _collect_xy(g, pieces)
        if not pieces:
            continue
        arr = np.vstack(pieces)
        xs, ys = arr[:, 0], arr[:, 1]
        minx = min(minx, float(xs.min()))
        maxx = max(maxx, float(xs.max()))
        miny = min(miny, float(ys.min()))
        maxy = max(maxy, float(ys.max()))
        n += 1
    bbox = None if n == 0 else [minx, miny, maxx, maxy]
    return sorted(types), bbox


def geo_metadata(table: pa.Table, geometry_cols=("geometry",),
                 with_bbox: bool = True) -> bytes:
    """The GeoParquet ``geo`` value (JSON, utf-8).  CRS is omitted —
    the engine's geographic columns are WGS84 lon/lat, exactly the
    case the reference omits by default
    (OGR_PARQUET_CRS_OMIT_IF_WGS84, ogrparquetwriterlayer.cpp:613)."""
    cols = {}
    for c in geometry_cols:
        types, bbox = _scan_column(table[c]) if with_bbox \
            else (_scan_column(table[c])[0], None)
        entry: dict = {"encoding": "WKB", "geometry_types": types}
        if with_bbox and bbox is not None:
            entry["bbox"] = bbox
        cols[c] = entry
    return json.dumps({
        "version": GEOPARQUET_VERSION,
        "primary_column": geometry_cols[0],
        "columns": cols,
    }).encode()


def _with_geo(table: pa.Table, geometry_cols, with_bbox=True) -> pa.Table:
    md = dict(table.schema.metadata or {})
    md[b"geo"] = geo_metadata(table, geometry_cols, with_bbox)
    return table.replace_schema_metadata(md)


def write_geoparquet(table: pa.Table, path: str,
                     geometry_cols=("geometry",)) -> None:
    pq.write_table(_with_geo(table, geometry_cols), path)


def write_geoparquet_dataset(ds, out_dir: str,
                             geometry_cols=("geometry",)):
    """Distributed GeoParquet sink: each block stamps its own ``geo``
    key (per-file bbox of that file's rows — valid per spec, bbox is
    an optional per-file statistic) and streams through Ray's parquet
    writer; no driver materialization."""
    gc = tuple(geometry_cols)
    return ds.map_batches(
        lambda b: _with_geo(b, gc), batch_format="pyarrow"
    ).write_parquet(out_dir)


def read_geoparquet(path: str):
    """Read one GeoParquet file → (table, parsed geo metadata).
    Raises on a missing/invalid ``geo`` key or a non-WKB encoding
    (the reader contract of ogrparquetlayer.cpp:92-115)."""
    t = pq.read_table(path)
    md = t.schema.metadata or {}
    if b"geo" not in md:
        raise ValueError(f"{path}: no GeoParquet 'geo' metadata")
    geo = json.loads(md[b"geo"].decode())
    for name, col in geo.get("columns", {}).items():
        if col.get("encoding") != "WKB":
            raise ValueError(
                f"{path}: unsupported geometry encoding "
                f"{col.get('encoding')!r} for column {name!r}")
    return t, geo
