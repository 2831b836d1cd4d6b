"""Broadcast hash join — the OGR SQL LEFT JOIN / lookup-join analog.

OGR's SQL dialect supports one-to-one equality lookup joins against a
(possibly external) secondary table (doc/source/user/ogr_sql_dialect.rst:
410-503; executor ogr/ogrsf_frmts/generic/ogr_gensql.cpp:109).  Here the
small side is broadcast (``ray.put`` once) and each batch joins against
it with pyarrow's C++ hash join — no shuffle at all.  For two large
sides, bucket both by key hash and join per bucket (see ray_guide
pattern); not needed by any current pipeline.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ._pool import autoscale as _autoscale


class BroadcastJoiner:
    """Actor callable: per-batch pyarrow hash join against the broadcast
    small table (join build side constructed once per actor)."""

    def __init__(self, small_ref, keys, join_type: str = "inner",
                 right_suffix: str = "_r"):
        self.small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) \
            else small_ref
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.join_type = join_type
        self.right_suffix = right_suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.small, keys=self.keys,
                          join_type=self.join_type,
                          right_suffix=self.right_suffix)


def broadcast_join(ds, small_table: pa.Table, keys,
                   join_type: str = "inner", concurrency=None,
                   batch_size: int = 65536):
    ref = ray.put(small_table)
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(small_ref=ref, keys=keys,
                                   join_type=join_type),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_autoscale(concurrency))
