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
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return narrow.groupby(_BUCKET).map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Fractional-coverage zonal stats (alg/zonal.cpp FRACTIONAL pixels mode:
# each pixel weighs by the exact fraction of its area the zone covers)
# ---------------------------------------------------------------------------


def _clip_halfplane(poly: np.ndarray, a: float, b: float,
                    c: float) -> np.ndarray:
    """Sutherland–Hodgman clip of ring ``poly`` (n,2 unclosed) against
    the half-plane a·x + b·y <= c."""
    n = len(poly)
    if n == 0:
        return poly
    d = a * poly[:, 0] + b * poly[:, 1] - c
    out = []
    for i in range(n):
        j = (i + 1) % n
        di, dj = d[i], d[j]
        if di <= 0.0:
            out.append(poly[i])
            if dj > 0.0:
                t = di / (di - dj)
                out.append(poly[i] + t * (poly[j] - poly[i]))
        elif dj <= 0.0:
            t = di / (di - dj)
            out.append(poly[i] + t * (poly[j] - poly[i]))
    return np.asarray(out).reshape(-1, 2)


def _ring_area(poly: np.ndarray) -> float:
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def cell_coverage(rings: list, gt, width: int, height: int):
    """Exact per-cell coverage fractions of one polygon (holes
    subtract) over the north-up grid ``gt``=(x0, dx, y0, dy).  Returns
    (py, px, frac) for cells with frac > 0 — the exactextract-style
    coverage raster of alg/zonal.cpp:1947 (pixel intersection
    fractions), computed by clipping each candidate cell against the
    ring (cells are convex, so Sutherland–Hodgman is exact)."""
    x0, dx, y0, dy = gt
    acc: dict = {}
    for sign, ring in rings:
        r = np.asarray(ring, np.float64)
        if len(r) >= 2 and np.allclose(r[0], r[-1]):
            r = r[:-1]
        if _ring_area(r) < 0:
            r = r[::-1]
        cx = (r[:, 0] - x0) / dx
        cy = (r[:, 1] - y0) / dy
        px0 = max(0, int(np.floor(cx.min())))
        px1 = min(width - 1, int(np.floor(cx.max())))
        py0 = max(0, int(np.floor(cy.min())))
        py1 = min(height - 1, int(np.floor(cy.max())))
        cell_area = abs(dx * dy)
        for py in range(py0, py1 + 1):
            ylo, yhi = sorted((y0 + py * dy, y0 + (py + 1) * dy))
            band = _clip_halfplane(r, 0.0, -1.0, -ylo)   # y >= ylo
            band = _clip_halfplane(band, 0.0, 1.0, yhi)  # y <= yhi
            if len(band) < 3:
                continue
            bx = (band[:, 0] - x0) / dx
            bpx0 = max(px0, int(np.floor(bx.min())))
            bpx1 = min(px1, int(np.floor(bx.max())))
            for px in range(bpx0, bpx1 + 1):
                xlo = x0 + px * dx
                xhi = x0 + (px + 1) * dx
                cell = _clip_halfplane(band, -1.0, 0.0, -xlo)
                cell = _clip_halfplane(cell, 1.0, 0.0, xhi)
                a = _ring_area(cell) / cell_area
                if a > 0.0:
                    key = (py, px)
                    acc[key] = acc.get(key, 0.0) + sign * a
    if not acc:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.float64),)
    keys = sorted(acc)
    py = np.array([k[0] for k in keys], np.int64)
    px = np.array([k[1] for k in keys], np.int64)
    frac = np.array([acc[k] for k in keys], np.float64)
    keep = frac > 0.0
    return py[keep], px[keep], frac[keep]


def zonal_fractional(zones: pa.Table, values_ds, gt, width: int,
                     height: int, value_col: str = "v",
                     id_col: str = "poly_id"):
    """Fractional-coverage zonal statistics: per zone, the coverage-
    weighted sum / weighted value sum / covered-cell count over a
    (py, px, value) cell table.  Zones scatter to (zone, cell, frac)
    rows in a map_batches kernel; the cell-value side joins through
    the size-dispatched join (broadcast while it fits)."""
    import ray.data as rd

    from ..geom import wkb as _wkb
    from .join import join_auto

    def emit(batch: pa.Table) -> pa.Table:
        pids, keys, fracs = [], [], []
        for pid, blob in zip(batch[id_col].to_pylist(),
                             batch["geometry"].to_pylist()):
            g = _wkb.decode(bytes(blob))
            polys = ([g["coordinates"]] if g["type"] == "Polygon"
                     else list(g["coordinates"]))
            rings = []
            for rl in polys:
                rings.append((1.0, rl[0]))
                rings.extend((-1.0, h) for h in rl[1:])
            py, px, fr = cell_coverage(rings, gt, width, height)
            pids.extend([pid] * len(py))
            keys.extend((py * np.int64(width) + px).tolist())
            fracs.extend(fr.tolist())
        return pa.table({
            id_col: pa.array(pids),
            "key": pa.array(keys, pa.int64()),
            "frac": pa.array(fracs, pa.float64()),
        })

    cover = rd.from_arrow(zones).map_batches(emit, batch_format="pyarrow")
    joined = join_auto(cover, values_ds, keys="key", join_type="left")

    def weigh(b: pa.Table) -> pa.Table:
        fr = b["frac"].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(np.isnan(v), 0.0, v)
        return pa.table({
            id_col: b[id_col],
            "frac": b["frac"],
            "wv": pa.array(fr * v),
        })

    from .aggregate import partial_final_agg
    pre = joined.map_batches(weigh, batch_format="pyarrow")
    return partial_final_agg(pre, id_col,
                             [("frac", "sum", "cov_sum"),
                              ("wv", "sum", "wv_sum"),
                              (None, "count", "n_cells")])
