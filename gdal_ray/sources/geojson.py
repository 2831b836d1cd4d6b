"""GeoJSON / GeoJSONSeq vector drivers.

The reference ships both a classic GeoJSON driver (one FeatureCollection
document) and GeoJSONSeq (newline-delimited features — RFC 8142), in
ogr/ogrsf_frmts/geojson/.  Re-expressed:

- `read_geojson(path)`: one FeatureCollection → arrow table (driver
  side — a single JSON document is inherently one blob; this is the
  small-layer path, e.g. method layers for the spatial join);
- `read_geojson_seq(paths)`: the SCALE path — newline-delimited
  features via `ray.data.read_text` + per-batch parsing, streaming and
  partition-parallel like any other source;
- `write_geojson_seq(ds, path)`: features out as one JSON object per
  line (RFC 8142 without the RS separator, which the reference also
  accepts, ogrgeojsonseqdriver.cpp).

Geometries travel as WKB in the `geometry` column (the engine's
convention); GeoJSON geometry dicts map 1:1 onto `geom.wkb.decode`'s
output, so conversion is a thin shim.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom import wkb as _wkb


def geojson_geom_to_wkb(g: dict) -> bytes:
    t = g["type"]
    c = g["coordinates"]
    if t == "Point":
        return _wkb.encode_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return _wkb.encode_linestring(np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        return _wkb.encode_polygon(
            [np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return _wkb.encode_multipolygon(
            [[np.asarray(r, dtype=np.float64) for r in poly]
             for poly in c])
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def wkb_to_geojson_geom(blob: bytes) -> dict:
    g = _wkb.decode(blob)

    def tolist(x):
        return np.asarray(x, dtype=np.float64).tolist()

    t = g["type"]
    c = g["coordinates"]
    if t == "Point":
        return {"type": t, "coordinates": tolist(c)}
    if t == "LineString":
        return {"type": t, "coordinates": tolist(c)}
    if t == "Polygon":
        return {"type": t, "coordinates": [tolist(r) for r in c]}
    if t == "MultiPolygon":
        return {"type": t,
                "coordinates": [[tolist(r) for r in poly] for poly in c]}
    raise ValueError(f"unsupported geometry type {t!r}")


def _features_to_table(features: list[dict]) -> pa.Table:
    props_keys: list[str] = []
    seen = set()
    for f in features:
        for k in (f.get("properties") or {}):
            if k not in seen:
                seen.add(k)
                props_keys.append(k)
    cols: dict[str, list] = {k: [] for k in props_keys}
    geoms: list[bytes | None] = []
    for f in features:
        p = f.get("properties") or {}
        for k in props_keys:
            cols[k].append(p.get(k))
        geom = f.get("geometry")
        geoms.append(geojson_geom_to_wkb(geom) if geom else None)
    out = {k: pa.array(v) for k, v in cols.items()}
    out["geometry"] = pa.array(geoms, pa.binary())
    return pa.table(out)


def read_geojson(path: str) -> pa.Table:
    """One FeatureCollection document → arrow table (small-layer path)."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") != "FeatureCollection":
        raise ValueError("expected a FeatureCollection")
    return _features_to_table(doc.get("features", []))


def read_geojson_seq(paths):
    """Newline-delimited GeoJSON features → Dataset (distributed)."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def parse(b: pa.Table) -> pa.Table:
        feats = []
        for line in b["text"].to_pylist():
            line = line.strip().lstrip("\x1e")  # optional RFC 8142 RS
            if line:
                feats.append(json.loads(line))
        return _features_to_table(feats)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_geojson_seq(ds, path: str, geometry_col: str = "geometry"):
    """Dataset → newline-delimited GeoJSON features under ``path``
    (a directory of part files — resumable, like every engine sink)."""

    def to_lines(b: pa.Table) -> pa.Table:
        names = [c for c in b.column_names if c != geometry_col]
        lines = []
        geom_list = b[geometry_col].to_pylist() \
            if geometry_col in b.column_names else [None] * len(b)
        prop_cols = {c: b[c].to_pylist() for c in names}
        for i in range(len(b)):
            feat = {
                "type": "Feature",
                "properties": {c: prop_cols[c][i] for c in names},
                "geometry": wkb_to_geojson_geom(geom_list[i])
                if geom_list[i] is not None else None,
            }
            lines.append(json.dumps(feat, separators=(",", ":")))
        return pa.table({"text": pa.array(lines, pa.string())})

    lines_ds = ds.map_batches(to_lines, batch_format="pyarrow")

    # write as plain text lines (one feature per line)
    import os
    os.makedirs(path, exist_ok=True)

    def write_block(b: pa.Table) -> pa.Table:
        import uuid
        fn = os.path.join(path, f"part-{uuid.uuid4().hex}.geojsonl")
        tmp = fn + ".tmp"
        with open(tmp, "w") as f:
            for line in b["text"].to_pylist():
                f.write(line + "\n")
        os.replace(tmp, fn)
        return pa.table({"path": pa.array([fn], pa.string()),
                         "rows": pa.array([len(b)], pa.int64())})

    return lines_ds.map_batches(write_block, batch_format="pyarrow")
