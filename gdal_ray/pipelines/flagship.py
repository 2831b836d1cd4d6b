"""The flagship pipeline: geotag → dedup → spatial join → tiles.

The end-to-end slice from SURVEY.md §7.1, the workload the north rule
measures (pages/sec of spatial-join + tiling):

    read_parquet(pages, columns pruned — html never leaves storage)
      → map_batches(geotag: regex lat/lon → WKB point + cell ids)
      → exact dedup by url (hash-partition groupby, keep first)
      → map_batches(SpatialJoiner actor pool: broadcast STR-indexed
        polygons, point-in-polygon, reference schema-merge rule)
      → tile assignment + partial+final tile counts + pyramid

Ray session ownership: these functions NEVER call ray.init/shutdown —
the caller (driver / bench.py / tests) owns the session.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions.geotag import geotag_batch
from ..stages import tiling as _tiling
from ..stages.dedup import dedup_exact
from ..stages.spatial_join import build_index, spatial_join
from ..sources import pages as _pages


def geotagged_pages(paths, parallelism: int | None = None,
                    cell_level: int = 12, prefix_level: int = 4):
    """read (pruned) → geotag.  `html` is excluded at the read: the
    join/tile path needs only url/warc_ts/text/lang (SURVEY.md §7.5
    wide-binary rule)."""
    ds = rd.read_parquet(
        paths, columns=["url", "warc_ts", "text", "lang"],
        **({"override_num_blocks": parallelism} if parallelism else {}))
    return ds.map_batches(
        lambda b: geotag_batch(b, cell_level=cell_level,
                               prefix_level=prefix_level),
        batch_format="pyarrow")


def flagship(paths, poly_table: pa.Table | None = None,
             zooms=(4, 6, 8), dedup: bool = True,
             join_concurrency=None, parallelism: int | None = None):
    """Full pipeline; returns (join_rows_ds, tile_counts_ds).

    Stage order is join-BEFORE-dedup: read → geotag → spatial join is a
    pure map chain, so the streaming executor pipelines it at full block
    width with no barrier; the dedup shuffle then runs on join rows.
    Duplicate urls carry byte-identical text → identical geotag →
    identical join partners, so dedup by (url, poly_id) after the join
    yields exactly the same row set as dedup-by-url before it, while
    keeping the expensive stage (the STRtree join) barrier-free.  The
    tile branch additionally projects to the narrow columns before the
    shuffle (SURVEY.md §7.5: wide payloads never enter a shuffle).

    Both returned Datasets are lazy; the caller consumes (count, write,
    iter) to execute with streaming backpressure.
    """
    if poly_table is None:
        poly_table = _pages.make_polygons_table()
    ds = geotagged_pages(paths, parallelism)
    idx = build_index(poly_table)  # one build, shared by both branches
    joined = spatial_join(ds, poly_table, operation="intersection",
                          predicate="intersects",
                          concurrency=join_concurrency, index=idx)
    # tile branch: project to the narrow columns BEFORE the join — the
    # join's row gather and every downstream shuffle then never touch
    # the wide text payload (SURVEY.md §7.5).  Only the branch the
    # caller consumes executes, so the two joins never both run.
    narrow_in = ds.select_columns(["url", "warc_ts", "lat", "lon"])
    narrow = spatial_join(
        narrow_in, poly_table.select(["poly_id", "geometry"]),
        operation="intersection", predicate="intersects",
        concurrency=join_concurrency, index=idx)
    if dedup:
        joined_out = dedup_exact(joined, key=["url", "poly_id"],
                                 order_col="warc_ts")
        # tile branch: duplicates carry byte-identical text → identical
        # geotag → identical (lat, lon, poly), so ANY representative
        # yields the same tile counts — dedup on a 128-bit url hash
        # (16 B) instead of shuffling the url string (~40 B) and skip
        # the order column entirely.  Collision odds at 10^12 urls are
        # ~(10^12)²/2^129 ≈ 1e-15 — far below the job's own
        # hardware-error floor.  The joined branch keeps exact strings.
        narrow = dedup_exact(_hash_url_narrow(narrow),
                             key=["u_h", "u_l", "poly_id"],
                             order_col=None)
        tile_ds = _tiling.tile_counts_g8(narrow, zooms)
    else:
        joined_out = joined
        tile_ds = _tiling.tile_counts(narrow, zooms)
    return joined_out, tile_ds


def _hash_url_narrow(ds):
    """(url, warc_ts, lat, lon, poly_id…) → (u_h, u_l, g8, poly_id):
    two independent 64-bit siphashes of url replace the string, and
    lat/lon collapse to the PACKED z8 global pixel ((gx8<<16)|gy8 as
    int32 — tile x/y at z ≤ 8 are shifts of it, tiling.tile_counts_g8)
    BEFORE the dedup exchange: 28 B/row instead of 40."""
    import numpy as _np
    import pandas as pd
    import pyarrow as _pa

    from ..geom import tiles as _tiles

    def kernel(b: _pa.Table) -> _pa.Table:
        s = b["url"].to_pandas()
        h1 = pd.util.hash_pandas_object(s, index=False,
                                        hash_key="gdal_ray_url_a_0")
        h2 = pd.util.hash_pandas_object(s, index=False,
                                        hash_key="gdal_ray_url_b_0")
        gx, gy = _tiles.global_pixel(
            b["lon"].to_numpy(zero_copy_only=False),
            b["lat"].to_numpy(zero_copy_only=False), 8)
        g8 = ((gx.astype(_np.uint32) << _np.uint32(16))
              | gy.astype(_np.uint32)).view(_np.int32)
        return _pa.table({
            "u_h": _pa.array(h1.values), "u_l": _pa.array(h2.values),
            "g8": _pa.array(g8), "poly_id": b["poly_id"],
        })

    return ds.map_batches(kernel, batch_format="pyarrow")
