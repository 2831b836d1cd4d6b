"""Checkpoint / lineage manifest tests (north rule: resumable from
checkpoint with per-partition lineage + metrics)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from gdal_ray.sources import manifest as mf


def _table(pids, n_per=10):
    import numpy as np

    pid = np.repeat(np.asarray(pids), n_per)
    return pa.table({
        "pid": pa.array(pid, pa.int64()),
        "v": pa.array(np.arange(len(pid), dtype=np.float64)),
    })


def test_write_partitioned_and_manifest(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "out")
    res = mf.write_partitioned(rd.from_arrow(_table([0, 1, 2])), out, "pid",
                               resume=False).to_pandas()
    assert sorted(res["partition"]) == ["0", "1", "2"]
    assert (res["rows"] == 10).all()
    recs = mf.read_manifest(out)
    assert len(recs) == 3
    for r in recs:
        assert r["rows"] == 10 and r["bytes"] > 0 and "wall_sec" in r
    # the data itself is readable per partition
    t = pq.read_table(os.path.join(out, "partition=1"))
    assert t.num_rows == 10


def test_resume_skips_completed(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "out")
    mf.write_partitioned(rd.from_arrow(_table([0, 1])), out, "pid",
                         resume=False).to_pandas()
    done_before = mf.completed_partitions(out)
    assert done_before == {"0", "1"}
    # corrupt partition 1's data dir mtime marker by recording bytes
    rec1 = json.load(open(os.path.join(mf.manifest_dir(out),
                                       "partition=1.json")))
    # resume run over a superset: only partition 2 should be written
    res = mf.write_partitioned(rd.from_arrow(_table([0, 1, 2])), out, "pid",
                               resume=True).to_pandas()
    assert sorted(res["partition"]) == ["2"]
    rec1_after = json.load(open(os.path.join(mf.manifest_dir(out),
                                             "partition=1.json")))
    assert rec1 == rec1_after  # untouched by the resumed run
    assert mf.completed_partitions(out) == {"0", "1", "2"}


def test_write_partition_atomic_overwrite(tmp_path):
    out = str(tmp_path / "o")
    t1 = _table([7], n_per=5)
    rec = mf.write_partition(out, "7", t1)
    assert rec["rows"] == 5
    t2 = _table([7], n_per=9)
    rec2 = mf.write_partition(out, "7", t2)
    assert rec2["rows"] == 9
    got = pq.read_table(os.path.join(out, "partition=7"))
    assert got.num_rows == 9  # replaced atomically, no mixed state


def test_geoparquet_roundtrip(tmp_path):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from gdal_ray.geom import wkb
    from gdal_ray.sources.geoparquet import (geo_metadata, read_geoparquet,
                                             write_geoparquet)

    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "geometry": pa.array([wkb.box_polygon(-10, -5, 20, 15),
                              wkb.encode_point(30, 40)], pa.binary()),
    })
    p = str(tmp_path / "g.parquet")
    write_geoparquet(t, p)
    t2, geo = read_geoparquet(p)
    assert t2["id"].to_pylist() == [1, 2]
    assert geo["version"] == "1.1.0"
    assert geo["primary_column"] == "geometry"
    col = geo["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["Point", "Polygon"]
    assert col["bbox"] == [-10.0, -5.0, 30.0, 40.0]
    # plain parquet without geo metadata is rejected
    plain = str(tmp_path / "plain.parquet")
    pq.write_table(pa.table({"a": [1]}), plain)
    with pytest.raises(ValueError):
        read_geoparquet(plain)
    # the raw JSON matches the builder
    assert json.loads(geo_metadata(t).decode()) == geo


def test_geoparquet_distributed_sink(tmp_path, ray_session):
    import glob

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.geom import wkb
    from gdal_ray.sources.geoparquet import (read_geoparquet,
                                             write_geoparquet_dataset)

    t = pa.table({
        "id": pa.array(list(range(20)), pa.int64()),
        "geometry": pa.array([wkb.encode_point(float(i), float(-i))
                              for i in range(20)], pa.binary()),
    })
    out = str(tmp_path / "sink")
    write_geoparquet_dataset(rd.from_arrow(t).repartition(3), out)
    files = sorted(glob.glob(out + "/*.parquet"))
    assert files
    total = 0
    for f in files:
        tf, geo = read_geoparquet(f)
        total += tf.num_rows
        b = geo["columns"]["geometry"]["bbox"]
        xs = [p[0] for p in
              [wkb.decode(w)["coordinates"]
               for w in tf["geometry"].to_pylist()]]
        assert b[0] == min(xs) and b[2] == max(xs)  # per-file bbox
    assert total == 20
