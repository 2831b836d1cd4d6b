"""Gap-based event sessionization — the training-data-pipeline
windowing primitive the reference's SQL layer lacks (session windows
over user event streams; the fixed-window analog is
events_windowed_hourly).

Semantics: events of one key, ordered by timestamp, split into a new
session wherever the gap since the PREVIOUS event exceeds ``gap``
seconds (strict >).  Equal timestamps are order-insensitive: a zero
gap never splits, so session membership, counts and bounds are
well-defined without a tie rule.

Distribution shape: the hash-bucket exchange of stages/dedup.py —
keys hash into ``n_buckets`` groups, one ``groupby(bucket)`` moves
each key's narrow (key, t) rows together, and a single vectorized
kernel (lexsort + diff + cumsum + reduceat) sessionizes every key of
the bucket at once.  No driver state; skewed users salt across rows
of one bucket but stay vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BUCKET = "__sess_bucket"


def sessionize(ds, key_col: str, ts_col: str, gap_s: float,
               n_buckets: int = 64):
    """Dataset of (key, session_idx, n_events, t_start, t_end) — one
    row per session; ``session_idx`` counts a key's sessions in time
    order from 0; t_* are epoch seconds (int64, floor)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        t = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        nb = pa.table({
            key_col: b[key_col],
            "__t": pa.array(t.to_numpy(zero_copy_only=False)
                            // 1_000_000),
        })
        # hash_key MUST be 16 bytes: pandas raises for shorter keys on
        # object/string dtypes (int keys skip the key path entirely)
        h = pd.util.hash_pandas_object(nb[key_col].to_pandas(),
                                       index=False,
                                       hash_key="gdal_ray_sess_00")
        return nb.append_column(
            _BUCKET, pa.array((h.values % np.uint64(n_buckets))
                              .astype(np.int32)))

    narrow = ds.map_batches(add_bucket, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        keys = g[key_col].to_numpy(zero_copy_only=False)
        t = g["__t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, keys))
        k, tt = keys[order], t[order]
        new_key = np.r_[True, k[1:] != k[:-1]]
        dt = np.r_[0, tt[1:] - tt[:-1]]
        start = new_key | (dt > gap_s)
        sid = np.cumsum(start) - 1  # global session ordinal in bucket
        starts = np.flatnonzero(start)
        ends = np.r_[starts[1:], len(k)]
        n_ev = ends - starts
        # per-key 0-based session index: ordinal minus the ordinal of
        # the key's first session
        key_first = np.flatnonzero(new_key)
        first_sid_per_run = sid[key_first]
        run_of_start = np.searchsorted(key_first, starts, side="right") - 1
        sess_idx = sid[starts] - first_sid_per_run[run_of_start]
        return pa.table({
            key_col: pa.array(k[starts]),
            "session_idx": pa.array(sess_idx.astype(np.int64)),
            "n_events": pa.array(n_ev.astype(np.int64)),
            "t_start": pa.array(tt[starts]),
            "t_end": pa.array(tt[ends - 1]),
        })

    return narrow.groupby(_BUCKET).map_groups(per_bucket,
                                              batch_format="pyarrow")


def lag_deltas(ds, key_col: str, ts_col: str, order_col: str,
               gap_threshold_us: int = 3_600_000_000,
               mod_us: int = 86_400_000_000, n_buckets: int = 64):
    """Per-key inter-arrival statistics — the LAG(ts) OVER (PARTITION
    BY key ORDER BY ts, order_col) window primitive reduced to exact
    int64 aggregates: one row per key with >= 2 events carrying
    (n_deltas, max_gap_us, n_gaps_over, gap_mod_sum), where deltas are
    consecutive microsecond differences, ``n_gaps_over`` counts deltas
    strictly above ``gap_threshold_us`` and ``gap_mod_sum`` sums
    delta % ``mod_us`` (non-telescoping checksum — a plain sum would
    collapse to last-first).  Same hash-bucket exchange + vectorized
    bucket kernel as sessionize; ``order_col`` breaks timestamp ties
    deterministically."""

    def add_bucket(b: pa.Table) -> pa.Table:
        t = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        nb = pa.table({
            key_col: b[key_col],
            "__t": t,
            "__o": b[order_col].cast(pa.int64()),
        })
        h = pd.util.hash_pandas_object(nb[key_col].to_pandas(),
                                       index=False,
                                       hash_key="gdal_ray_sess_00")
        return nb.append_column(
            _BUCKET, pa.array((h.values % np.uint64(n_buckets))
                              .astype(np.int32)))

    narrow = ds.map_batches(add_bucket, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        keys = g[key_col].to_numpy(zero_copy_only=False)
        t = g["__t"].to_numpy(zero_copy_only=False)
        o = g["__o"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, t, keys))
        k, tt = keys[order], t[order]
        same = k[1:] == k[:-1]
        du = k[1:][same]
        dv = (tt[1:] - tt[:-1])[same]
        if len(du) == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "n_deltas": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64()),
                "n_gaps_over": pa.array([], pa.int64()),
                "gap_mod_sum": pa.array([], pa.int64()),
            })
        starts = np.flatnonzero(np.r_[True, du[1:] != du[:-1]])
        ends = np.r_[starts[1:], len(du)]
        return pa.table({
            key_col: pa.array(du[starts]),
            "n_deltas": pa.array((ends - starts).astype(np.int64)),
            "max_gap_us": pa.array(np.maximum.reduceat(dv, starts)
                                   .astype(np.int64)),
            "n_gaps_over": pa.array(
                np.add.reduceat((dv > gap_threshold_us)
                                .astype(np.int64), starts)),
            "gap_mod_sum": pa.array(np.add.reduceat(dv % mod_us,
                                                    starts)
                                    .astype(np.int64)),
        })

    return narrow.groupby(_BUCKET).map_groups(per_bucket,
                                              batch_format="pyarrow")


def user_tracks(ds, key_col: str, ts_col: str, order_col: str,
                lon_col: str = "lon", lat_col: str = "lat",
                n_buckets: int = 64):
    """Per-key trajectory assembly (the ST_MakeLine / track-building
    pass of a telemetry pipeline): events of one key ordered by
    (ts, order_col) form a polyline; one row per key with n_points,
    n_segments, the ANTIMERIDIAN-AWARE degree length (per-segment
    dlon folded into (-180, 180] — the ogr2ogr -wrapdateline
    convention that a jump > 180° crosses the dateline), and the
    lon/lat bbox of the raw points.  Same hash-bucket exchange +
    lexsort/diff kernel as sessionize."""

    def add_bucket(b: pa.Table) -> pa.Table:
        t = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        nb = pa.table({
            key_col: b[key_col],
            "__t": t,
            "__o": b[order_col].cast(pa.int64()),
            "__lon": b[lon_col],
            "__lat": b[lat_col],
        })
        h = pd.util.hash_pandas_object(nb[key_col].to_pandas(),
                                       index=False,
                                       hash_key="gdal_ray_sess_00")
        return nb.append_column(
            _BUCKET, pa.array((h.values % np.uint64(n_buckets))
                              .astype(np.int32)))

    narrow = ds.map_batches(add_bucket, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        keys = g[key_col].to_numpy(zero_copy_only=False)
        t = g["__t"].to_numpy(zero_copy_only=False)
        o = g["__o"].to_numpy(zero_copy_only=False)
        lon = g["__lon"].to_numpy(zero_copy_only=False)
        lat = g["__lat"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, t, keys))
        k = keys[order]
        lon, lat = lon[order], lat[order]
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(k)]
        same = ~new[1:]
        dlon_raw = lon[1:] - lon[:-1]
        # fold into (-180, 180]: a jump > 180 deg crosses the dateline
        dlon = dlon_raw - 360.0 * np.ceil((dlon_raw - 180.0) / 360.0)
        dlat = lat[1:] - lat[:-1]
        seglen = np.sqrt(dlon * dlon + dlat * dlat)
        # per-key segment-length sums via reduceat over key runs
        seg_l = np.where(same, seglen, 0.0)
        length = np.add.reduceat(np.r_[0.0, seg_l], starts)
        nseg = np.add.reduceat(np.r_[0, same.astype(np.int64)], starts)
        return pa.table({
            key_col: pa.array(k[starts]),
            "n_points": pa.array((ends - starts).astype(np.int64)),
            "n_segments": pa.array(nseg.astype(np.int64)),
            "track_len": pa.array(length, pa.float64()),
            "min_lon": pa.array(np.minimum.reduceat(lon, starts)),
            "max_lon": pa.array(np.maximum.reduceat(lon, starts)),
            "min_lat": pa.array(np.minimum.reduceat(lat, starts)),
            "max_lat": pa.array(np.maximum.reduceat(lat, starts)),
        })

    return narrow.groupby(_BUCKET).map_groups(per_bucket,
                                              batch_format="pyarrow")
