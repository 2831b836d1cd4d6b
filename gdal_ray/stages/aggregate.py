"""Partial+final (salted) aggregation helpers.

The skew strategy the north rule names: dense urban cells can be 10^4×
the median, so a bare ``groupby(cell)`` would ship every page row of a
hot cell to one reducer.  Instead each batch combines locally (one
partial row per key per batch — pyarrow ``Table.group_by`` in C++), and
the final shuffle moves only partials.  This is the classic
partial/combiner plan (the reference's analog: per-thread accumulation
in grid/zonal stats, alg/gdalgrid.cpp:3650-3667, merged at the end).

``salted_group_agg`` adds an explicit salt for the *final* stage too —
needed only when even the partial-per-key cardinality is dominated by a
few keys across MANY batches (then: partial → groupby((key, salt)) →
groupby(key)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PARTIALABLE = {"sum", "count", "min", "max"}


def _partial_agg_batch(batch: pa.Table, keys, aggs) -> pa.Table:
    """aggs: list of (col, fn, out_name); fn ∈ sum|count|min|max|mean.
    mean is decomposed into sum+count partials."""
    plan = []
    renames = list(keys)
    for col, fn, out in aggs:
        if fn == "mean":
            plan.append((col, "sum"))
            renames.append(f"__sum_{out}")
            plan.append((col, "count"))
            renames.append(f"__cnt_{out}")
        elif fn == "count":
            plan.append(([], "count_all"))
            renames.append(f"__cnt_{out}")
        elif fn in _PARTIALABLE:
            plan.append((col, fn))
            renames.append(f"__{fn}_{out}")
        else:
            raise ValueError(f"unsupported partial agg {fn}")
    g = batch.group_by(keys).aggregate(plan)
    # pyarrow (>=7) puts key columns first, then aggregates in plan order
    return g.rename_columns(renames)


def partial_final_agg(ds, keys, aggs):
    """ds.groupby(keys) with per-batch partials.

    aggs: list of (col, fn, out_name), fn ∈ sum|count|min|max|mean.
    Returns Dataset with columns keys ++ out_names.
    """
    from ray.data.aggregate import Max, Min, Sum

    keys = [keys] if isinstance(keys, str) else list(keys)
    partial = ds.map_batches(
        lambda b: _partial_agg_batch(b, keys, aggs), batch_format="pyarrow")
    final_aggs = []
    for col, fn, out in aggs:
        if fn == "mean":
            final_aggs.append(Sum(f"__sum_{out}", alias_name=f"__sum_{out}"))
            final_aggs.append(Sum(f"__cnt_{out}", alias_name=f"__cnt_{out}"))
        elif fn in ("sum", "count"):
            src = f"__cnt_{out}" if fn == "count" else f"__sum_{out}"
            final_aggs.append(Sum(src, alias_name=src))
        elif fn == "min":
            final_aggs.append(Min(f"__min_{out}", alias_name=f"__min_{out}"))
        elif fn == "max":
            final_aggs.append(Max(f"__max_{out}", alias_name=f"__max_{out}"))
    merged = partial.groupby(keys[0] if len(keys) == 1 else keys).aggregate(
        *final_aggs)

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for col, fn, out in aggs:
            if fn == "mean":
                import pyarrow.compute as pc
                cols[out] = pc.divide(
                    pc.cast(batch[f"__sum_{out}"], pa.float64()),
                    pc.cast(batch[f"__cnt_{out}"], pa.float64()))
            elif fn == "count":
                cols[out] = batch[f"__cnt_{out}"]
            else:
                cols[out] = batch[f"__{fn}_{out}"]
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


_BUCKET = "__agg_bucket"


def bucketed_group_agg(ds, keys, aggs, buckets: int = 256):
    """Wide-key groupby-aggregate via a single-int-key hash shuffle.

    Ray's sort-based Aggregate on a composite key pays a per-block
    multi-key sort + boundary scan that dominates when partials barely
    reduce (e.g. tile counts: each block touches most tiles, so the
    final aggregate sees ~input-sized data).  Here every partial row is
    assigned ``hash(keys) % buckets`` and the shuffle groups by that ONE
    int32 — inside each bucket group a vectorized pandas groupby
    finishes the job for thousands of keys at once.

    aggs: list of (col, fn, out_name), fn ∈ sum|count|min|max|mean.
    Returns Dataset with columns keys ++ out_names.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pa.Table) -> pa.Table:
        g = _partial_agg_batch(b, keys, aggs)
        kdf = g.select(keys).to_pandas()
        h = pd.util.hash_pandas_object(kdf, index=False,
                                       hash_key="gdal_ray_gagg_00")
        return g.append_column(
            _BUCKET, pa.array((h.values % np.uint64(buckets))
                              .astype(np.int32)))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    plan = {}
    for col, fn, out in aggs:
        if fn == "mean":
            plan[f"__sum_{out}"] = "sum"
            plan[f"__cnt_{out}"] = "sum"
        elif fn in ("sum", "count"):
            plan[f"__cnt_{out}" if fn == "count" else f"__sum_{out}"] = "sum"
        else:
            plan[f"__{fn}_{out}"] = fn

    def final(g: pa.Table) -> pa.Table:
        merged = g.to_pandas().groupby(keys, sort=False,
                                       as_index=False).agg(plan)
        cols = {k: merged[k] for k in keys}
        for col, fn, out in aggs:
            if fn == "mean":
                cols[out] = (merged[f"__sum_{out}"].astype(float)
                             / merged[f"__cnt_{out}"].astype(float))
            elif fn == "count":
                cols[out] = merged[f"__cnt_{out}"]
            else:
                cols[out] = merged[f"__{fn}_{out}"]
        return pa.Table.from_pandas(pd.DataFrame(cols),
                                    preserve_index=False).replace_schema_metadata(None)

    return partials.groupby(_BUCKET).map_groups(final,
                                                batch_format="pyarrow")


def grouped_agg_with_distinct(ds, keys, aggs, distinct_aggs,
                              buckets: int = 64):
    """Fused GROUP BY plan mixing regular aggregates with
    COUNT(DISTINCT col) — ONE hash-bucket exchange, no materialize, no
    join (replaces the r4 materialize + base-count exchange + per-column
    pair/count exchanges + left-join plan that doubled latency).

    Per batch, a tagged union is emitted: tag 0 rows carry the per-key
    regular partials (plus a __base count so groups whose distinct
    argument is entirely NULL still survive with count 0); tag i>0 rows
    carry the batch-unique NULL-filtered (key, value) pairs of distinct
    column i.  Everything exchanges once on hash(keys) % buckets, and
    the bucket finalizer merges vectorized (arrow group_by for the
    distinct dedup+count — no int64→float pandas lossy cast — pandas
    only for the partial-column reduce).

    Scale note: all pairs of one group land in one bucket group — the
    same co-location the exact-dedup stage relies on; per-batch dedup
    bounds what moves at V = #distinct values per (key, batch).

    aggs: (col, fn, out) with fn ∈ sum|count|min|max|mean;
    distinct_aggs: (col, alias) — COUNT(DISTINCT col) AS alias.
    """
    import pyarrow.compute as pc

    keys = [keys] if isinstance(keys, str) else list(keys)
    base_aggs = list(aggs) + [(None, "count", "__base")]

    def partial(b: pa.Table) -> pa.Table:
        t0 = _partial_agg_batch(b, keys, base_aggs)
        t0 = t0.append_column(
            "__tag", pa.array(np.zeros(t0.num_rows, np.int8)))
        parts = [t0]
        for i, (dcol, _alias) in enumerate(distinct_aggs):
            sel = b.select(keys + [dcol]).filter(pc.is_valid(b[dcol]))
            pairs = sel.group_by(keys + [dcol],
                                 use_threads=False).aggregate([])
            pairs = pairs.rename_columns(keys + [f"__dv_{i}"])
            parts.append(pairs.append_column(
                "__tag", pa.array(np.full(pairs.num_rows, i + 1,
                                          np.int8))))
        out = pa.concat_tables(parts, promote_options="default")
        kdf = out.select(keys).to_pandas()
        h = pd.util.hash_pandas_object(kdf, index=False,
                                       hash_key="gdal_ray_gagg_00")
        return out.append_column(
            _BUCKET, pa.array((h.values % np.uint64(buckets))
                              .astype(np.int32)))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    plan = {}
    for col, fn, out in base_aggs:
        if fn == "mean":
            plan[f"__sum_{out}"] = "sum"
            plan[f"__cnt_{out}"] = "sum"
        elif fn in ("sum", "count"):
            plan[f"__cnt_{out}" if fn == "count" else f"__sum_{out}"] = "sum"
        else:
            plan[f"__{fn}_{out}"] = fn

    def final(g: pa.Table) -> pa.Table:
        t0 = g.filter(pc.equal(g["__tag"], 0))
        merged = t0.to_pandas().groupby(
            keys, sort=False, as_index=False, dropna=False).agg(plan)
        for i, (dcol, alias) in enumerate(distinct_aggs):
            ti = g.filter(pc.equal(g["__tag"], i + 1))
            uniq = ti.select(keys + [f"__dv_{i}"]).group_by(
                keys + [f"__dv_{i}"], use_threads=False).aggregate([])
            cnt = uniq.group_by(keys, use_threads=False).aggregate(
                [([], "count_all")])
            cdf = cnt.rename_columns(keys + [alias]).to_pandas()
            merged = merged.merge(cdf, on=keys, how="left")
            merged[alias] = merged[alias].fillna(0).astype("int64")
        cols = {k: merged[k] for k in keys}
        for col, fn, out in aggs:
            if fn == "mean":
                cols[out] = (merged[f"__sum_{out}"].astype(float)
                             / merged[f"__cnt_{out}"].astype(float))
            elif fn == "count":
                cols[out] = merged[f"__cnt_{out}"]
            else:
                cols[out] = merged[f"__{fn}_{out}"]
        for _dcol, alias in distinct_aggs:
            cols[alias] = merged[alias]
        return pa.Table.from_pandas(pd.DataFrame(cols),
                                    preserve_index=False).replace_schema_metadata(None)

    return partials.groupby(_BUCKET).map_groups(final,
                                                batch_format="pyarrow")


def add_salt_batch(batch: pa.Table, key: str, buckets: int,
                   out: str = "salt") -> pa.Table:
    """Deterministic salt column = crc-mix of the key modulo buckets —
    splits a hot key across reducers for two-stage aggregation."""
    import zlib

    vals = batch[key].to_pylist()
    salt = np.array(
        [zlib.crc32(str(v).encode()) % buckets for v in vals], dtype=np.int32)
    return batch.append_column(out, pa.array(salt, pa.int32()))


def salted_group_count(ds, key: str, buckets: int = 16):
    """Two-stage salted count for pathologically hot keys:
    groupby((key, salt)) partials → groupby(key) final sum."""
    from ray.data.aggregate import Sum

    salted = ds.map_batches(
        lambda b: _partial_agg_batch(
            add_salt_batch(b, key, buckets), [key, "salt"],
            [(key, "count", "n")]),
        batch_format="pyarrow")
    stage1 = salted.groupby([key, "salt"]).aggregate(
        Sum("__cnt_n", alias_name="n_partial"))
    final = stage1.groupby(key).aggregate(Sum("n_partial", alias_name="n"))
    return final


def grouped_quantiles(ds, key_col: str, value_col: str, q: float = 0.9,
                      buckets: int = 64):
    """Exact per-key MEDIAN + QUANTILE_CONT(q) as a two-stage
    value-histogram plan: per-batch (key, value) -> count partials
    collapse the (typically small) value domain BEFORE the exchange,
    then one hash-bucket groupby co-locates each key's histogram and a
    per-key merge walks the cumulative counts.  Interpolation is the
    type-7 rule DuckDB uses (pos = q*(n-1), x = v_lo + frac*(v_hi -
    v_lo); median = mean of the two middles for even n).  Exact for
    any value set — the histogram is lossless, not a sketch; the
    domain size only bounds the exchange width."""

    def part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": b[key_col].to_pandas(),
            "v": b[value_col].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["k", "v"], sort=False).size().reset_index()
        g.columns = ["k", "v", "c"]
        h = pd.util.hash_pandas_object(g["k"], index=False,
                                       hash_key="gdal_ray_gagg_00")
        t = pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)
        return t.append_column(
            _BUCKET, pa.array((h.values % np.uint64(buckets))
                              .astype(np.int32)))

    partials = ds.map_batches(part, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["k", "v"], sort=True)["c"].sum() \
            .reset_index()
        keys_out, med_out, q_out, n_out = [], [], [], []
        for k, sub in df.groupby("k", sort=True):
            v = sub["v"].to_numpy()
            c = sub["c"].to_numpy().astype(np.int64)
            cum = np.cumsum(c)
            n = int(cum[-1])

            def at(rank):  # 0-based order statistic from the histogram
                return float(v[np.searchsorted(cum, rank, "right")])

            if n % 2:
                med = at((n - 1) // 2)
            else:
                med = (at(n // 2 - 1) + at(n // 2)) / 2.0
            pos = q * (n - 1)
            lo = int(np.floor(pos))
            frac = pos - lo
            v0 = at(lo)
            v1 = at(min(lo + 1, n - 1))
            keys_out.append(k)
            med_out.append(med)
            q_out.append(v0 + frac * (v1 - v0))
            n_out.append(n)
        return pa.table({
            key_col: pa.array(keys_out),
            "n": pa.array(n_out, pa.int64()),
            "median_v": pa.array(med_out, pa.float64()),
            "quantile_v": pa.array(q_out, pa.float64()),
        })

    return partials.groupby(_BUCKET).map_groups(final,
                                                batch_format="pyarrow")


def grouped_mode(ds, key_col: str, value_col: str,
                 buckets: int = 64):
    """Exact per-key MODE (most frequent value, ties to the SMALLEST
    value — a deterministic rule DuckDB's mode() does not promise, so
    the oracle restates it with ROW_NUMBER): same lossless
    value-histogram plan as grouped_quantiles — per-batch (key,
    value) counts collapse the domain before one bucket exchange."""

    def part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": b[key_col].to_pandas(),
            "v": b[value_col].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["k", "v"], sort=False).size().reset_index()
        g.columns = ["k", "v", "c"]
        h = pd.util.hash_pandas_object(g["k"], index=False,
                                       hash_key="gdal_ray_gagg_00")
        t = pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)
        return t.append_column(
            _BUCKET, pa.array((h.values % np.uint64(buckets))
                              .astype(np.int32)))

    partials = ds.map_batches(part, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["k", "v"], sort=True)["c"].sum() \
            .reset_index()
        # per key: max count, then smallest value among the tied
        df = df.sort_values(["k", "c", "v"],
                            ascending=[True, False, True])
        top = df.groupby("k", sort=True).head(1)
        return pa.Table.from_pandas(
            pd.DataFrame({key_col: top["k"].values,
                          "mode_v": top["v"].values,
                          "mode_n": top["c"].values.astype(np.int64)}),
            preserve_index=False).replace_schema_metadata(None)

    return partials.groupby(_BUCKET).map_groups(final,
                                                batch_format="pyarrow")
