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


# default broadcast ceiling: the build side must fit in every worker's
# heap next to a streaming batch; 256 MB leaves headroom on the 4 GB
# heaps this engine sizes for (same dispatch pattern as
# stages/raster.py:value_at_points_auto)
BROADCAST_MAX_BYTES = 256 << 20


def join_auto(ds, lookup_ds, keys, right_keys=None,
              join_type: str = "inner",
              broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
              concurrency=None):
    """Size-dispatched equi-join: if the lookup side's estimated size
    fits under ``broadcast_max_bytes`` it is collected ONCE and
    broadcast (``ray.put`` → per-actor pyarrow hash join, no shuffle);
    otherwise both sides go through Ray's distributed hash join with a
    data-proportional partition count.  ``right_keys`` renames the
    lookup side's key columns to match ``keys`` (broadcast path renames
    columns; shuffle path passes ``right_on``)."""
    from ._pool import cluster_cpus

    keys = [keys] if isinstance(keys, str) else list(keys)
    rk = ([right_keys] if isinstance(right_keys, str)
          else list(right_keys)) if right_keys else keys
    # normalize join type across the two engines' spellings
    jt_pa = {"inner": "inner", "left": "left outer",
             "left outer": "left outer",
             "left_outer": "left outer"}.get(join_type)
    jt_ray = {"inner": "inner", "left": "left_outer",
              "left outer": "left_outer",
              "left_outer": "left_outer"}.get(join_type)
    if jt_pa is None:
        raise ValueError(f"unsupported join_type {join_type!r}")
    try:
        est = lookup_ds.size_bytes()
    except Exception:
        est = None
    if est is None:
        # unknown size (e.g. an un-executed groupby output) is NOT
        # "small" — collecting an unbounded lookup side could OOM the
        # driver (ADVICE r3).  Materialize to the OBJECT STORE to learn
        # the real size instead of guessing: tiny aggregate outputs
        # (the common case) then broadcast as before, and a genuinely
        # large side stays distributed without ever touching the
        # driver heap.
        lookup_ds = lookup_ds.materialize()
        try:
            est = lookup_ds.size_bytes()
        except Exception:
            est = None
    if est is not None and est <= broadcast_max_bytes:
        # groupby outputs can contain schema-less empty blocks — drop
        parts = [t for t in ray.get(list(lookup_ds.to_arrow_refs()))
                 if t.num_columns]
        if parts:
            tbl = pa.concat_tables(parts)
        else:
            tbl = lookup_ds.schema().base_schema.empty_table()
        if rk != keys:
            tbl = tbl.rename_columns(
                [keys[rk.index(c)] if c in rk else c
                 for c in tbl.column_names])
        return broadcast_join(ds, tbl, keys, join_type=jt_pa,
                              concurrency=concurrency)
    try:
        left_est = ds.size_bytes() or 0
    except Exception:
        left_est = 0
    nparts = int(min(max(16, (left_est + (est or 0)) // (128 << 20)),
                     16 * cluster_cpus()))
    return ds.join(lookup_ds, join_type=jt_ray,
                   num_partitions=nparts,
                   on=tuple(keys), right_on=tuple(rk))


class AsofJoiner:
    """Actor callable: per-batch backward as-of lookup against the
    broadcast right side.  The right table sorts once per actor into
    {group: (times, value columns)}; each batch then resolves with one
    searchsorted per group present (vectorized, no row loop)."""

    def __init__(self, right_ref, on: str, by: str, right_on: str,
                 right_by: str):
        import numpy as np

        right = ray.get(right_ref) if isinstance(right_ref,
                                                 ray.ObjectRef) \
            else right_ref
        self.on, self.by = on, by
        self.value_cols = [c for c in right.column_names
                           if c not in (right_on, right_by)]
        self.value_types = {c: right.schema.field(c).type
                            for c in self.value_cols}
        g = right[right_by].to_numpy(zero_copy_only=False)
        t = right[right_on].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, g))
        g, t = g[order], t[order]
        # apply the gather ONCE per column, then slice per group — the
        # per-group v[order] gather was O(groups * N)
        vals = {c: right[c].to_numpy(zero_copy_only=False)[order]
                for c in self.value_cols}
        self.groups = {}
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)]
        for s, e in zip(starts, ends):
            self.groups[g[s]] = (
                t[s:e], {c: v[s:e] for c, v in vals.items()})

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        bg = batch[self.by].to_numpy(zero_copy_only=False)
        bt = batch[self.on].to_numpy(zero_copy_only=False)
        n = len(batch)
        # preserve each value column's dtype — a float64 working array
        # would silently corrupt int64/decimal values beyond 2^53
        out = {}
        for c in self.value_cols:
            src_dtype = next(iter(self.groups.values()))[1][c].dtype \
                if self.groups else np.float64
            out[c] = np.zeros(n, dtype=src_dtype)
        valid = np.zeros(n, dtype=bool)
        for gv in np.unique(bg):
            m = bg == gv
            grp = self.groups.get(gv)
            if grp is None:
                continue
            rt, vals = grp
            idx = np.searchsorted(rt, bt[m], side="right") - 1
            ok = idx >= 0
            mi = np.flatnonzero(m)
            valid[mi[ok]] = True
            for c in self.value_cols:
                out[c][mi[ok]] = vals[c][idx[ok]]
        res = batch
        for c in self.value_cols:
            res = res.append_column(
                c, pa.array(out[c], self.value_types[c],
                            mask=~valid))
        return res


def asof_join_broadcast(ds, right_table: pa.Table, *, on: str, by: str,
                        right_on: str | None = None,
                        right_by: str | None = None,
                        concurrency=None, batch_size: int = 65536):
    """Backward as-of join: each left row picks the right row with the
    greatest ``right_on`` <= its ``on`` within the same ``by`` group
    (LEFT semantics — no candidate → null).  The right side broadcasts
    via ray.put; at scale the right side is the small reference stream
    (rates, checkpoints, model versions) so no shuffle touches the
    event stream.  Matches DuckDB's ``ASOF LEFT JOIN`` semantics."""
    ref = ray.put(right_table)
    return ds.map_batches(
        AsofJoiner,
        fn_constructor_kwargs=dict(right_ref=ref, on=on, by=by,
                                   right_on=right_on or on,
                                   right_by=right_by or by),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_autoscale(concurrency))
