"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in gdal_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Ray workers import gdal_ray by module name; if the driver process was
# started outside the repo, ship the package by value instead.
try:
    import gdal_ray  # noqa: F401

    if os.getcwd() != _REPO:
        # MUST be Ray's vendored cloudpickle — registering with the
        # standalone cloudpickle package has no effect on Ray's
        # serializer and workers then fail to import gdal_ray.
        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(gdal_ray)
except Exception:  # pragma: no cover
    pass


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive page-shaped
    rows from the events table (url/warc_ts/html/text/lang with an
    embedded geotag), then run the full geotag → dedup → spatial-join
    stage chain and return the join-row Dataset."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from gdal_ray.pipelines.queries import zone_table
    from gdal_ray.functions.geotag import geotag_batch
    from gdal_ray.stages.dedup import dedup_exact
    from gdal_ray.stages.spatial_join import spatial_join

    def to_pages(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        lat = -60.0 + ((ids * 7919) % 26000) / 200.0
        lon = -180.0 + ((ids * 104729) % 72000) / 200.0
        text = [f"page {i} geo:{la:.6f},{lo:.6f} lang:en"
                for i, la, lo in zip(ids, lat, lon)]
        return pa.table({
            "url": pa.array([f"https://site{i % 1000}.example/page/{i}"
                             for i in ids], pa.string()),
            "warc_ts": pa.array(ids * 1000, pa.timestamp("ms")),
            "html": pa.array([t.encode() for t in text], pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(np.full(len(ids), "en", dtype=object).tolist(),
                             pa.string()),
        })

    pages = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                            columns=["event_id"]) \
        .map_batches(to_pages, batch_format="pyarrow")
    geo = pages.map_batches(
        lambda b: geotag_batch(b.drop_columns(["html"])),
        batch_format="pyarrow")
    deduped = dedup_exact(geo, key="url", order_col="warc_ts")
    joined = spatial_join(deduped, zone_table(), operation="intersection",
                          concurrency=2)
    return joined


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from gdal_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    ops (UTM reprojection series, IDW weights, MinHash/SimHash/IVF/LSH
    signatures, heuristic lang-id, spatial sort) are intentionally
    omitted."""
    from gdal_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
