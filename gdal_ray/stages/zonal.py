"""Extended zonal statistics — the non-decomposable aggregate set.

The reference's zonal stats support count/min/max/mean/sum/stddev plus
median, minority, majority and variety (alg/zonal.cpp:661-697,
alg/raster_stats.h).  sum/min/max/mean decompose into partials
(stages.aggregate); median/minority/majority/variety need every value
of a zone together, so they shuffle narrow (zone, value) rows with the
hash-bucket plan (one int32 shuffle key, thousands of zones finished
vectorized per bucket group).

Tie rule (documented, deterministic): majority = most frequent value,
ties broken toward the SMALLEST value; minority = least frequent, same
tie rule.  Median of an even count = mean of the two middle values
(matching DuckDB/pandas interpolation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BUCKET = "__zonal_bucket"


def zonal_extended(ds, zone_col: str, value_col: str, buckets: int = 64):
    """Dataset of (zone_col, median, minority, majority, variety, n)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        b = b.select([zone_col, value_col])
        h = pd.util.hash_pandas_object(b[zone_col].to_pandas(), index=False,
                                       hash_key="gdal_ray_zonal_0")
        return b.append_column(
            _BUCKET, pa.array((h.values % np.uint64(buckets))
                              .astype(np.int32)))

    narrow = ds.map_batches(add_bucket, batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        """ONE vectorized pass for the whole bucket (no per-zone Python
        loop — the bucket may hold 10^4+ zones at scale): median via
        groupby.median; minority/majority/variety from a (zone, value)
        count frame sorted so the winner is each zone's first row."""
        df = g.to_pandas()
        med = df.groupby(zone_col, sort=False)[value_col] \
            .agg(median="median", n="size").reset_index()
        cnt = df.groupby([zone_col, value_col], sort=False) \
            .size().reset_index(name="c")
        # majority: count desc, value asc → first row per zone
        maj = cnt.sort_values([zone_col, "c", value_col],
                              ascending=[True, False, True]) \
            .drop_duplicates(zone_col)[[zone_col, value_col]] \
            .rename(columns={value_col: "majority"})
        mino = cnt.sort_values([zone_col, "c", value_col],
                               ascending=[True, True, True]) \
            .drop_duplicates(zone_col)[[zone_col, value_col]] \
            .rename(columns={value_col: "minority"})
        var = cnt.groupby(zone_col, sort=False) \
            .size().reset_index(name="variety")
        out = med.merge(mino, on=zone_col).merge(maj, on=zone_col) \
            .merge(var, on=zone_col)
        out = out[[zone_col, "median", "minority", "majority",
                   "variety", "n"]]
        out["median"] = out["median"].astype(np.float64)
        out["minority"] = out["minority"].astype(np.float64)
        out["majority"] = out["majority"].astype(np.float64)
        out["variety"] = out["variety"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return narrow.groupby(_BUCKET).map_groups(finish, batch_format="pyarrow")
