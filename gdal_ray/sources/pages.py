"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md T1)
plus the polygon / reference-point fixture layers (T2, T3).

The pages schema is the authoritative input shape from
BASELINE.json.input_hint: (url:string, warc_ts:timestamp[ms],
html:binary, text:string, lang:string).  Everything is a pure function
of the row id i (seed 42), so any shard can be (re)generated
independently and runs are byte-reproducible — the property the
per-partition lineage manifests rely on.

lat/lon skew: 80% of rows cluster in 4 urban hot cells (fixed centers,
±0.05° jitter from a seeded PRNG), 20% uniform — bakes in the hot-cell
skew the salted aggregates are designed for.  1% duplicate urls with
byte-identical text (dedup fixture).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
LANGS = ["en", "de", "fr", "es", "pt", "zh"]
HOT_CENTERS = [
    (48.8566, 2.3522),     # Paris
    (40.7128, -74.0060),   # New York
    (35.6762, 139.6503),   # Tokyo
    (-23.5505, -46.6333),  # São Paulo
]
EPOCH_MS = 1767225600000  # 2026-01-01T00:00:00Z


def page_latlon(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic skewed lat/lon per row id."""
    rs = np.random.RandomState(SEED)
    # per-id deterministic uniforms independent of array slicing: derive
    # from a hash-mix of the id rather than sequential draws
    h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    u1 = ((h >> np.uint64(11)) & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32
    u2 = ((h >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32
    u3 = ((h * np.uint64(0xBF58476D1CE4E5B9)) >> np.uint64(33)).astype(
        np.float64) / 2**31
    hot = u1 < 0.8
    centers = np.asarray(HOT_CENTERS)
    ci = (ids % len(HOT_CENTERS)).astype(np.int64)
    lat_hot = centers[ci, 0] + (u2 - 0.5) * 0.1
    lon_hot = centers[ci, 1] + (u3 % 1.0 - 0.5) * 0.1
    lat_uni = -60.0 + u2 * 130.0
    lon_uni = -180.0 + (u3 % 1.0) * 360.0
    _ = rs  # seed documented; jitter is hash-derived for slice-independence
    return np.where(hot, lat_hot, lat_uni), np.where(hot, lon_hot, lon_uni)


def make_pages_table(start: int, count: int) -> pa.Table:
    """Rows [start, start+count) of the canonical pages table.

    Fully vectorized (pyarrow binary_join_element_wise over numpy-
    formatted pieces) — ~10x faster than per-row f-strings, which
    matters because bench fixtures reach 10^7 rows."""
    import pyarrow.compute as pc

    ids = np.arange(start, start + count, dtype=np.int64)
    # 1% of rows (i % 100 == 99, i >= 100) duplicate url/text of i-99
    eff = np.where((ids % 100 == 99) & (ids >= 100), ids - 99, ids)
    lat, lon = page_latlon(eff)
    langs_arr = np.asarray(LANGS, dtype=object)
    lang = pa.array(langs_arr[(eff % len(LANGS)).astype(np.int64)].tolist(),
                    pa.string())
    eff_s = pa.array(np.char.mod("%d", eff).tolist(), pa.string())
    site_s = pa.array(np.char.mod("%d", eff % 1000).tolist(), pa.string())
    lat_s = pa.array(np.char.mod("%.6f", lat).tolist(), pa.string())
    lon_s = pa.array(np.char.mod("%.6f", lon).tolist(), pa.string())
    url = pc.binary_join_element_wise(
        "https://site", site_s, ".example/page/", eff_s, "")
    text = pc.binary_join_element_wise(
        "page ", eff_s, " geo:", lat_s, ",", lon_s, " lang:", lang, "")
    pad = pa.array([("x" * int(p)) for p in (ids % 64)], pa.string())
    html = pc.binary_join_element_wise(
        "<html><body>", text, "<!--pad:", pad, "--></body></html>", "")
    ts = EPOCH_MS + ids * 1000  # duplicates arrive LATER (larger warc_ts)
    return pa.table({
        "url": url,
        "warc_ts": pa.array(ts, pa.timestamp("ms")),
        "html": pc.cast(html, pa.binary()),
        "text": text,
        "lang": lang,
    })


def write_pages_parquet(out_dir: str, total_rows: int,
                        rows_per_file: int = 250_000) -> list[str]:
    """Materialize the fixture as a sharded parquet directory; each shard
    is row-id-addressed so generation parallelizes and reruns are
    byte-identical.  Skips shards that already exist (resume)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for shard, start in enumerate(range(0, total_rows, rows_per_file)):
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        tmp = path + ".tmp"
        count = min(rows_per_file, total_rows - start)
        pq.write_table(make_pages_table(start, count), tmp,
                       row_group_size=65536)
        os.replace(tmp, path)
    return paths


# --- T2: polygon method layer ---------------------------------------------


def make_polygons_table() -> pa.Table:
    """Fixture polygon layer: the reference layer-algebra literals
    (autotest/ogr/ogr_layer_algebra.py:55-100) + 0.1°-boxes around each
    hot-cell center + a dateline-crossing and a polar box."""
    from ..geom import wkb as _wkb

    wkts = [
        "POLYGON ((1 2,1 3,3 3,3 2,1 2))",
        "POLYGON ((5 2,5 3,7 3,7 2,5 2))",
        "POLYGON ((2 1,2 4,6 4,6 1,2 1))",
    ]
    geoms = [_wkb.wkt_to_wkb(w) for w in wkts]
    names = ["ref_a1", "ref_a2", "ref_b1"]
    for (clat, clon) in HOT_CENTERS:
        geoms.append(_wkb.box_polygon(clon - 0.05, clat - 0.05,
                                      clon + 0.05, clat + 0.05))
        names.append(f"urban_{clat:.4f}_{clon:.4f}")
    # dateline-crossing box, represented as a multipolygon of two halves
    geoms.append(_wkb.encode_multipolygon([
        [[(179.5, -10), (180.0, -10), (180.0, 10), (179.5, 10), (179.5, -10)]],
        [[(-180.0, -10), (-179.5, -10), (-179.5, 10), (-180.0, 10),
          (-180.0, -10)]],
    ]))
    names.append("dateline")
    geoms.append(_wkb.box_polygon(-180, 80, 180, 85))  # polar band
    names.append("polar")
    n = len(geoms)
    return pa.table({
        "poly_id": pa.array(np.arange(n, dtype=np.int32)),
        "name": pa.array(names, pa.string()),
        "same_in_both_layers": pa.array(np.ones(n, dtype=np.int32)),
        "geometry": pa.array(geoms, pa.binary()),
    })


def make_admin_polygons(n_target: int = 1024, seed: int = 7) -> pa.Table:
    """Deterministic admin-boundary-style method layer for the bench:
    ~n_target irregular convex polygons over the populated band
    (lat -60..70), denser near the hot-cell centers so the join
    workload has the same skew as the page distribution.  Polygon
    complexity (8-24 vertices) and overlap mirror real admin layers —
    this is what makes the spatial join compute-dominated, as it is in
    production (joining against 10^3-10^5 boundaries)."""
    from ..geom import wkb as _wkb
    from ..geom.ops import convex_hull_points

    rs = np.random.RandomState(seed)
    n_hot = n_target // 2
    n_uni = n_target - n_hot
    centers = np.asarray(HOT_CENTERS)
    ci = rs.randint(0, len(centers), n_hot)
    # hot districts spread over a metro area (±2°) with small radii so a
    # page matches ~1 district, not a 16-deep pile — join output stays
    # O(pages), as with real admin layers (a point is in ~1 district)
    lat_c = np.concatenate([
        centers[ci, 0] + rs.normal(0, 2.0, n_hot),
        rs.uniform(-60, 70, n_uni)])
    lon_c = np.concatenate([
        centers[ci, 1] + rs.normal(0, 2.0, n_hot),
        rs.uniform(-180, 180, n_uni)])
    radius = np.concatenate([
        rs.uniform(0.02, 0.12, n_hot), rs.uniform(0.3, 2.0, n_uni)])
    geoms = []
    for k in range(n_target):
        nv = int(rs.randint(8, 25))
        th = np.sort(rs.uniform(0, 2 * np.pi, nv))
        r = radius[k] * rs.uniform(0.6, 1.0, nv)
        ring = np.column_stack([
            np.clip(lon_c[k] + r * np.cos(th), -180.0, 180.0),
            np.clip(lat_c[k] + r * np.sin(th), -85.0, 85.0)])
        hull = convex_hull_points(ring)
        if len(hull) < 3:
            hull = np.array([[lon_c[k], lat_c[k]],
                             [lon_c[k] + 0.01, lat_c[k]],
                             [lon_c[k], lat_c[k] + 0.01]])
        geoms.append(_wkb.encode_polygon([hull]))
    return pa.table({
        "poly_id": pa.array(np.arange(n_target, dtype=np.int32)),
        "name": pa.array([f"admin_{k}" for k in range(n_target)],
                         pa.string()),
        "geometry": pa.array(geoms, pa.binary()),
    })


# --- T3: kNN reference points ---------------------------------------------


def make_ref_points_table() -> pa.Table:
    """Deterministic grid of reference points + a coincident-distance
    tie pair + an isolated region (NODATA fixture)."""
    xs, ys, kinds = [], [], []
    kind_cycle = ["station", "poi", "city"]
    i = 0
    for gy in range(-5, 6):
        for gx in range(-5, 6):
            xs.append(gx * 10.0)
            ys.append(gy * 10.0)
            kinds.append(kind_cycle[i % 3])
            i += 1
    # tie fixture: two points equidistant from probe (2.5, 0):
    # ids of these two are consecutive; later-scanned must win
    xs += [2.0, 3.0]
    ys += [0.0, 0.0]
    kinds += ["tie_a", "tie_b"]
    n = len(xs)
    return pa.table({
        "ref_id": pa.array(np.arange(n, dtype=np.int32)),
        "kind": pa.array(kinds, pa.string()),
        "x": pa.array(np.asarray(xs), pa.float64()),
        "y": pa.array(np.asarray(ys), pa.float64()),
    })
