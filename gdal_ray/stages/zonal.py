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
        out = []
        for zone, sub in g.to_pandas().groupby(zone_col, sort=False):
            v = sub[value_col].values
            counts = pd.Series(v).value_counts()
            # ties toward smallest value: sort by (count, value)
            cdf = counts.reset_index()
            cdf.columns = ["value", "c"]
            maj = cdf.sort_values(["c", "value"],
                                  ascending=[False, True]).iloc[0]["value"]
            mino = cdf.sort_values(["c", "value"],
                                   ascending=[True, True]).iloc[0]["value"]
            out.append((zone, float(np.median(v)), float(mino), float(maj),
                        int(len(counts)), int(len(v))))
        df = pd.DataFrame(out, columns=[zone_col, "median", "minority",
                                        "majority", "variety", "n"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return narrow.groupby(_BUCKET).map_groups(finish, batch_format="pyarrow")
