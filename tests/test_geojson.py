"""GeoJSON / GeoJSONSeq driver tests + CSV + external registry steps."""

import json
import os

import numpy as np
import pyarrow as pa

from gdal_ray.geom.ops import wkb_area
from gdal_ray.sources.geojson import (
    read_geojson,
    read_geojson_seq,
    wkb_to_geojson_geom,
    write_geojson_seq,
)


def _fc(tmp_path):
    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"name": "a", "pop": 10},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4],
                                       [0, 0]]]}},
        {"type": "Feature", "properties": {"name": "b", "pop": 20},
         "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
    ]}
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(doc))
    return str(p)


def test_read_geojson_feature_collection(tmp_path):
    t = read_geojson(_fc(tmp_path))
    assert t.column_names == ["name", "pop", "geometry"]
    assert t["name"].to_pylist() == ["a", "b"]
    assert wkb_area(t["geometry"][0].as_py()) == 16.0


def test_geojson_seq_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    t = read_geojson(_fc(tmp_path))
    out_dir = str(tmp_path / "seq")
    res = write_geojson_seq(rd.from_arrow(t), out_dir).to_pandas()
    assert res["rows"].sum() == 2
    back = read_geojson_seq(
        [os.path.join(out_dir, f) for f in os.listdir(out_dir)])
    df = back.to_pandas().sort_values("name")
    assert list(df["name"]) == ["a", "b"]
    assert wkb_area(df["geometry"].iloc[0]) == 16.0


def test_wkb_geojson_geometry_roundtrip():
    from gdal_ray.geom import wkb as _wkb
    from gdal_ray.sources.geojson import geojson_geom_to_wkb

    for g in (
        {"type": "Point", "coordinates": [3.0, -7.5]},
        {"type": "LineString", "coordinates": [[0, 0], [1, 2], [3, 1]]},
        {"type": "Polygon",
         "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]},
        {"type": "MultiPolygon",
         "coordinates": [[[[0, 0], [1, 0], [1, 1], [0, 0]]],
                         [[[5, 5], [6, 5], [6, 6], [5, 5]]]]},
    ):
        blob = geojson_geom_to_wkb(g)
        back = wkb_to_geojson_geom(blob)
        assert back["type"] == g["type"]

        def flat(c):
            return np.asarray(c, dtype=object).ravel().tolist() \
                if g["type"] != "MultiPolygon" else \
                [v for poly in c for ring in poly for pt in ring
                 for v in pt]

        np.testing.assert_allclose(
            np.asarray(flat(back["coordinates"]), dtype=np.float64),
            np.asarray(flat(g["coordinates"]), dtype=np.float64))


def test_external_step_roundtrip(ray_session, tmp_path):
    """external step: spill → run command → read back (here the command
    just copies the parquet files through)."""
    import ray.data as rd

    from gdal_ray.pipelines.registry import REGISTRY

    ds = rd.from_arrow(pa.table({"a": pa.array([1, 2, 3], pa.int64())}))
    out = REGISTRY["external"](
        ds, {"command": "cp {input}/*.parquet {output}/"}).to_pandas()
    assert sorted(out["a"]) == [1, 2, 3]


def test_csv_steps_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from gdal_ray.pipelines.registry import REGISTRY

    ds = rd.from_arrow(pa.table({"a": pa.array([5, 6], pa.int64()),
                                 "b": pa.array(["x", "y"])}))
    out_dir = str(tmp_path / "csv")
    REGISTRY["write_csv"](ds, {"path": out_dir})
    back = REGISTRY["read_csv"](None, {"paths": out_dir}).to_pandas()
    assert sorted(back["a"]) == [5, 6]
