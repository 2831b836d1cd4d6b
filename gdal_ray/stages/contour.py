"""Contour extraction — per-tile marching squares over the tile table.

The reference's contour (alg/contour.cpp, marching-squares core in
alg/marching_squares/) re-expressed per tile: each 2x2 pixel-center
cell emits 0-2 line segments per level, linearly interpolated, in
GLOBAL z+8 pixel coordinates (pixel centers at integer+0.5).

Seam cells (cells straddling a tile boundary) are evaluated by a
dedicated exchange: every tile emits its four edge strips and four
corner pixels keyed by the seam they belong to; one hash-bucketed
``groupby`` re-assembles each seam's 2-wide grid (absent neighbors
are zero-filled — the tile mosaic is the zero-padded global grid, so
a level>0 isoline is closed around the data) and runs the SAME
marching-squares kernel on it.  An isoline crossing a tile boundary
is therefore gap-free (golden-tested against a single-array run over
the zero-padded mosaic in tests/test_contour.py).

`assemble_polylines` merges the segment soup into ordered polylines
per (z, level) — the reference's line-merge step (alg/contour.cpp
appenders), implemented as an endpoint-matching walk per group.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TILE = 256

# marching-squares segment table: case index (b0=TL, b1=TR, b2=BR,
# b3=BL above-level) → list of (edge_a, edge_b) pairs; edges 0=top,
# 1=right, 2=bottom, 3=left
_CASES: dict[int, list[tuple[int, int]]] = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(3, 0)],
    2: [(0, 1)], 13: [(0, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    8: [(2, 3)], 7: [(2, 3)],
    3: [(3, 1)], 12: [(3, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    5: [(3, 0), (1, 2)],   # ambiguous saddle: standard resolution
    10: [(0, 1), (2, 3)],
}


def _interp(va: np.ndarray, vb: np.ndarray, level: float) -> np.ndarray:
    d = vb - va
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(d != 0.0, (level - va) / d, 0.5)
    return np.clip(t, 0.0, 1.0)


def tile_contour_segments(grid: np.ndarray, level: float,
                          gx0: float, gy0: float) -> np.ndarray:
    """Marching squares on one tile → (n, 4) array of segment endpoints
    (x0, y0, x1, y1) in global pixel-center coordinates."""
    g = grid.astype(np.float64)
    tl = g[:-1, :-1]
    tr = g[:-1, 1:]
    br = g[1:, 1:]
    bl = g[1:, :-1]
    case = ((tl > level).astype(np.int64)
            | ((tr > level).astype(np.int64) << 1)
            | ((br > level).astype(np.int64) << 2)
            | ((bl > level).astype(np.int64) << 3))
    segs = []
    cy, cx = np.nonzero((case > 0) & (case < 15))
    if not len(cy):
        return np.empty((0, 4))
    cases = case[cy, cx]
    # edge point (global coords) per edge id for the selected cells
    x = gx0 + cx + 0.5
    y = gy0 + cy + 0.5
    a_tl, a_tr = tl[cy, cx], tr[cy, cx]
    a_br, a_bl = br[cy, cx], bl[cy, cx]
    edge_pts = {
        0: (x + _interp(a_tl, a_tr, level), y),                # top
        1: (x + 1.0, y + _interp(a_tr, a_br, level)),          # right
        2: (x + _interp(a_bl, a_br, level), y + 1.0),          # bottom
        3: (x, y + _interp(a_tl, a_bl, level)),                # left
    }
    for code, pairs in _CASES.items():
        if not pairs:
            continue
        m = cases == code
        if not m.any():
            continue
        for ea, eb in pairs:
            xa, ya = edge_pts[ea]
            xb, yb = edge_pts[eb]
            segs.append(np.column_stack([xa[m], ya[m], xb[m], yb[m]]))
    return np.vstack(segs) if segs else np.empty((0, 4))


def _seg_table(z_arr, lv_arr, seg_arrs) -> pa.Table:
    cat = np.concatenate
    empty = np.empty(0)
    if seg_arrs:
        s = np.vstack(seg_arrs)
    else:
        s = np.empty((0, 4))
    return pa.table({
        "z": pa.array(cat(z_arr) if z_arr else np.empty(0, np.int32)),
        "level": pa.array(cat(lv_arr) if lv_arr else empty, pa.float64()),
        "x0": pa.array(s[:, 0], pa.float64()),
        "y0": pa.array(s[:, 1], pa.float64()),
        "x1": pa.array(s[:, 2], pa.float64()),
        "y1": pa.array(s[:, 3], pa.float64()),
    })


# seam kinds: 0 = vertical (between (x,y) and (x+1,y)), 1 = horizontal
# (between (x,y) and (x,y+1)), 2 = corner (4 tiles around the
# (x+1,y+1) grid corner); side = which neighbor contributed the strip
_SEAM_V, _SEAM_H, _SEAM_C = 0, 1, 2


def _pack_seam(z: int, kind: int, x: int, y: int) -> int:
    return (int(z) << 54) | (int(kind) << 52) | (int(x) << 26) | int(y)


def seam_strips(batch: pa.Table) -> pa.Table:
    """Per tile: emit the 4 edge strips + 4 corner pixels, keyed by the
    seam each belongs to.  Payload = the strip's uint16 values."""
    keys, kinds, xs, ys, zs, sides, payloads = [], [], [], [], [], [], []

    def emit(z, kind, sx, sy, side, vals):
        # a seam exists only when BOTH sides are inside the global
        # 2^z tile grid (no x-wrap; cells beyond the grid edge don't
        # exist — the zero padding applies to absent tiles, not to
        # the world boundary)
        n = 1 << z
        if sx < 0 or sy < 0:
            return
        if kind in (_SEAM_V, _SEAM_C) and sx + 1 >= n:
            return
        if kind in (_SEAM_H, _SEAM_C) and sy + 1 >= n:
            return
        keys.append(_pack_seam(z, kind, sx, sy))
        kinds.append(kind)
        xs.append(sx)
        ys.append(sy)
        zs.append(z)
        sides.append(side)
        payloads.append(np.ascontiguousarray(vals, dtype=np.uint16)
                        .tobytes())

    for z, x, y, blob in zip(batch["z"].to_pylist(),
                             batch["x"].to_pylist(),
                             batch["y"].to_pylist(),
                             batch["raster"].to_pylist()):
        g = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
            .reshape(TILE, TILE)
        z, x, y = int(z), int(x), int(y)
        emit(z, _SEAM_V, x, y, 0, g[:, -1])        # my right edge
        emit(z, _SEAM_V, x - 1, y, 1, g[:, 0])     # neighbor's left seam
        emit(z, _SEAM_H, x, y, 0, g[-1, :])        # my bottom edge
        emit(z, _SEAM_H, x, y - 1, 1, g[0, :])     # neighbor's top seam
        emit(z, _SEAM_C, x, y, 0, g[-1:, -1])      # corner pixels
        emit(z, _SEAM_C, x - 1, y, 1, g[-1:, 0])
        emit(z, _SEAM_C, x, y - 1, 2, g[:1, -1])
        emit(z, _SEAM_C, x - 1, y - 1, 3, g[:1, 0])
    return pa.table({
        "skey": pa.array(keys, pa.int64()),
        "kind": pa.array(kinds, pa.int8()),
        "sx": pa.array(xs, pa.int32()),
        "sy": pa.array(ys, pa.int32()),
        "z": pa.array(zs, pa.int32()),
        "side": pa.array(sides, pa.int8()),
        "strip": pa.array(payloads, pa.binary()),
    })


def _seam_grid(kind: int, parts: dict[int, np.ndarray]) -> tuple:
    """Assemble one seam's little grid (absent sides → zeros) and its
    global-pixel origin offsets relative to (sx*TILE, sy*TILE)."""
    if kind == _SEAM_V:
        grid = np.zeros((TILE, 2))
        if 0 in parts:
            grid[:, 0] = parts[0]
        if 1 in parts:
            grid[:, 1] = parts[1]
        return grid, TILE - 1, 0
    if kind == _SEAM_H:
        grid = np.zeros((2, TILE))
        if 0 in parts:
            grid[0, :] = parts[0]
        if 1 in parts:
            grid[1, :] = parts[1]
        return grid, 0, TILE - 1
    grid = np.zeros((2, 2))
    for side, (r, c) in ((0, (0, 0)), (1, (0, 1)), (2, (1, 0)),
                         (3, (1, 1))):
        if side in parts:
            grid[r, c] = parts[side][0]
    return grid, TILE - 1, TILE - 1


def seam_segments(levels, n_buckets: int = 64):
    """Group fn factory: one hash bucket of seam strips → seam-cell
    contour segments (vectorized per seam via the shared kernel)."""
    def per_bucket(g: pa.Table) -> pa.Table:
        skey = g["skey"].to_numpy(zero_copy_only=False)
        order = np.argsort(skey, kind="stable")
        zs_arr, lv_arr, segs = [], [], []
        kind_a = g["kind"].to_numpy(zero_copy_only=False)
        sx_a = g["sx"].to_numpy(zero_copy_only=False)
        sy_a = g["sy"].to_numpy(zero_copy_only=False)
        zz_a = g["z"].to_numpy(zero_copy_only=False)
        side_a = g["side"].to_numpy(zero_copy_only=False)
        strips = g["strip"].to_pylist()
        ks = skey[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        for s, e in zip(starts, ends):
            rows = order[s:e]
            r0 = rows[0]
            kind = int(kind_a[r0])
            parts = {int(side_a[r]): np.frombuffer(strips[r],
                                                   dtype=np.uint16)
                     for r in rows}
            grid, ox, oy = _seam_grid(kind, parts)
            gx0 = int(sx_a[r0]) * TILE + ox
            gy0 = int(sy_a[r0]) * TILE + oy
            for level in levels:
                segm = tile_contour_segments(grid, level, gx0, gy0)
                if len(segm):
                    zs_arr.append(np.full(len(segm), zz_a[r0],
                                          dtype=np.int32))
                    lv_arr.append(np.full(len(segm), level))
                    segs.append(segm)
        return _seg_table(zs_arr, lv_arr, segs)

    return per_bucket


def contour_segments(tiles_ds, levels, seams: bool = True,
                     n_buckets: int = 64):
    """Tile table → Dataset of contour segments:
    (z, level, x0, y0, x1, y1) in global pixel coordinates.
    ``seams=True`` adds the cross-tile seam cells via one bucketed
    exchange of edge strips (gap-free isolines at tile boundaries)."""
    levels = [float(v) for v in levels]
    if seams:
        # both branches consume the tile table; materialize ONCE (it is
        # the small aggregated table) so the upstream render pipeline
        # doesn't re-execute per branch
        tiles_ds = tiles_ds.materialize()
    interior = _contour_interior(tiles_ds, levels)
    if not seams:
        return interior
    strips = tiles_ds.map_batches(seam_strips, batch_format="pyarrow")
    strips = strips.map_batches(
        lambda b: b.append_column(
            "bucket", pa.array((b["skey"].to_numpy(zero_copy_only=False)
                                % n_buckets).astype(np.int32))),
        batch_format="pyarrow")
    seam = strips.groupby("bucket").map_groups(
        seam_segments(levels, n_buckets), batch_format="pyarrow")
    return interior.union(seam)


def _contour_interior_batch(batch: pa.Table, levels) -> pa.Table:
    zs, lv, x0s, y0s, x1s, y1s = [], [], [], [], [], []
    for z, x, y, blob in zip(batch["z"].to_pylist(),
                             batch["x"].to_pylist(),
                             batch["y"].to_pylist(),
                             batch["raster"].to_pylist()):
        grid = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
            .reshape(TILE, TILE)
        for level in levels:
            s = tile_contour_segments(grid, level,
                                      int(x) * TILE, int(y) * TILE)
            if not len(s):
                continue
            zs.append(np.full(len(s), z, dtype=np.int32))
            lv.append(np.full(len(s), level))
            x0s.append(s[:, 0])
            y0s.append(s[:, 1])
            x1s.append(s[:, 2])
            y1s.append(s[:, 3])
    cat = np.concatenate
    empty = np.empty(0)
    return pa.table({
        "z": pa.array(cat(zs) if zs else np.empty(0, np.int32)),
        "level": pa.array(cat(lv) if lv else empty, pa.float64()),
        "x0": pa.array(cat(x0s) if x0s else empty, pa.float64()),
        "y0": pa.array(cat(y0s) if y0s else empty, pa.float64()),
        "x1": pa.array(cat(x1s) if x1s else empty, pa.float64()),
        "y1": pa.array(cat(y1s) if y1s else empty, pa.float64()),
    })


def _contour_interior(tiles_ds, levels):
    return tiles_ds.map_batches(
        lambda b: _contour_interior_batch(b, levels),
        batch_format="pyarrow")


def _quant(v: np.ndarray) -> np.ndarray:
    # endpoints are pixel centers or linear interpolations; 2^20
    # sub-pixel quanta keyed as int64 makes endpoint matching exact
    return np.round(np.asarray(v, dtype=np.float64)
                    * 1048576.0).astype(np.int64)


def assemble_group_polylines(g: pa.Table) -> pa.Table:
    """One (z, level) group of segments → ordered polylines
    (endpoint-matching walk, the reference's line-merge step in
    alg/contour.cpp's appenders).  Open chains start at odd-degree
    endpoints; remaining segments form closed rings."""
    x0 = g["x0"].to_numpy(zero_copy_only=False)
    y0 = g["y0"].to_numpy(zero_copy_only=False)
    x1 = g["x1"].to_numpy(zero_copy_only=False)
    y1 = g["y1"].to_numpy(zero_copy_only=False)
    n = len(x0)
    # endpoint key = the (qx, qy) TUPLE — a packed int64 would let y's
    # high bits alias into the x field for |y| > 4 px (and overflow at
    # deep zooms); keys never leave this group, so no packing is needed
    ka = list(zip(_quant(x0).tolist(), _quant(y0).tolist()))
    kb = list(zip(_quant(x1).tolist(), _quant(y1).tolist()))
    adj: dict[tuple, list[int]] = {}
    for i in range(n):
        adj.setdefault(ka[i], []).append(i)
        adj.setdefault(kb[i], []).append(i)
    used = np.zeros(n, dtype=bool)

    def walk(start_seg: int, start_key: tuple):
        """Follow segments from start_key; returns point list."""
        pts_x, pts_y = [], []
        key = start_key
        seg = start_seg
        # first point = the endpoint we start from
        if ka[seg] == key:
            pts_x.append(x0[seg]); pts_y.append(y0[seg])
        else:
            pts_x.append(x1[seg]); pts_y.append(y1[seg])
        while True:
            used[seg] = True
            nxt_key = kb[seg] if ka[seg] == key else ka[seg]
            if nxt_key == kb[seg]:
                pts_x.append(x1[seg]); pts_y.append(y1[seg])
            else:
                pts_x.append(x0[seg]); pts_y.append(y0[seg])
            cands = [s for s in adj.get(nxt_key, []) if not used[s]]
            if not cands:
                break
            seg, key = cands[0], nxt_key
        return pts_x, pts_y

    lines = []
    # open chains first: endpoints of odd degree
    for key, segs in adj.items():
        if len(segs) % 2 == 1:
            for s in segs:
                if not used[s]:
                    lines.append(walk(s, key))
    # remaining: closed rings
    for i in range(n):
        if not used[i]:
            lines.append(walk(i, ka[i]))
    z0 = g["z"][0].as_py() if n else 0
    lv0 = g["level"][0].as_py() if n else 0.0
    from ..geom import wkb as _wkb
    out_wkb, n_pts, closed = [], [], []
    for px, py in lines:
        out_wkb.append(_wkb.encode_linestring(
            np.column_stack([px, py])))
        n_pts.append(len(px))
        closed.append(abs(px[0] - px[-1]) < 1e-9
                      and abs(py[0] - py[-1]) < 1e-9)
    k = len(lines)
    return pa.table({
        "z": pa.array(np.full(k, z0, dtype=np.int32)),
        "level": pa.array(np.full(k, lv0), pa.float64()),
        "line_id": pa.array(np.arange(k, dtype=np.int32)),
        "n_pts": pa.array(n_pts, pa.int64()),
        "closed": pa.array(closed, pa.bool_()),
        "wkb": pa.array(out_wkb, pa.binary()),
    })


def _level_bits(level: np.ndarray) -> np.ndarray:
    return np.asarray(level, np.float64).view(np.int64)


def _mix_to_bucket(*cols, buckets: int) -> np.ndarray:
    h = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        h ^= (np.asarray(c).astype(np.int64).view(np.uint64)
              * np.uint64(0x9E3779B97F4A7C15))
        h ^= h >> np.uint64(29)
    return (h % np.uint64(buckets)).astype(np.int32)


def _split_apply(g: pa.Table, key_cols, fn) -> pa.Table:
    """Split one bucket group into its (key_cols) subgroups
    (lexsort + boundary scan — no hash dict) and apply fn per
    subgroup, concatenating arrow results."""
    if len(g) == 0:
        return fn(g)
    arrs = [g[c].to_numpy(zero_copy_only=False) for c in key_cols]
    order = np.lexsort(tuple(reversed(arrs)))
    gs = g.take(pa.array(order))
    arrs = [a[order] for a in arrs]
    change = np.zeros(len(gs), dtype=bool)
    change[0] = True
    for a in arrs:
        change[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], len(gs)]
    outs = [fn(gs.slice(s, e - s)) for s, e in zip(starts, ends)]
    outs = [t for t in outs if t.num_columns]
    return pa.concat_tables(outs) if outs else fn(g.slice(0, 0))


def assemble_polylines(segments_ds, region_px: int | None = 1024,
                       n_buckets: int = 64):
    """Segment soup → polylines per (z, level), DISTRIBUTED two-stage:

    1. segments are bucketed into square spatial REGIONS of
       ``region_px`` global pixels and walked per (z, level, region) —
       the heavy O(segments) endpoint-matching work runs wide;
    2. only the resulting FRAGMENTS (one row per chain, ~segments ÷
       chain length, orders of magnitude smaller) gather per
       (z, level) where a second endpoint-matching walk stitches
       region-crossing chains end-to-end.

    Both exchanges go through a SINGLE int32 hash bucket (the
    bucketed_group_agg pattern) — Ray's sort-based groupby on the
    composite (z, level:f64, region:i64) key cost ~5.5 s of the r4
    9 s wall; the bucket exchange sorts 64 small ints instead, and
    the per-bucket kernel splits subgroups with one lexsort.

    ``region_px=None`` collapses to the single-gather plan (the
    reference's shape, alg/contour.cpp — fine for small rasters)."""
    if region_px is None:
        return segments_ds.groupby(["z", "level"]).map_groups(
            assemble_group_polylines, batch_format="pyarrow")

    def add_region(b: pa.Table) -> pa.Table:
        rx = (b["x0"].to_numpy(zero_copy_only=False)
              // region_px).astype(np.int64)
        ry = (b["y0"].to_numpy(zero_copy_only=False)
              // region_px).astype(np.int64)
        region = (rx << 24) | ry
        z = b["z"].to_numpy(zero_copy_only=False)
        lv = _level_bits(b["level"].to_numpy(zero_copy_only=False))
        b = b.append_column("region", pa.array(region))
        return b.append_column(
            "__cb", pa.array(_mix_to_bucket(z, lv, region,
                                            buckets=n_buckets)))

    staged = segments_ds.map_batches(add_region, batch_format="pyarrow")

    def walk_bucket(g: pa.Table) -> pa.Table:
        out = _split_apply(g, ["z", "level", "region"],
                           assemble_group_polylines)
        z = out["z"].to_numpy(zero_copy_only=False)
        lv = _level_bits(out["level"].to_numpy(zero_copy_only=False))
        return out.append_column(
            "__sb", pa.array(_mix_to_bucket(z, lv, buckets=n_buckets)))

    fragments = staged.groupby("__cb").map_groups(
        walk_bucket, batch_format="pyarrow")

    def stitch_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__sb"]) if "__sb" in g.column_names else g
        return _split_apply(g, ["z", "level"], _stitch_fragments)

    return fragments.groupby("__sb").map_groups(
        stitch_bucket, batch_format="pyarrow")


def contour_polylines_ds(tiles_ds, levels, region_px: int = 1024,
                         n_buckets: int = 32):
    """Tile table → stitched polylines with ONE fused exchange for
    seam-completion + region walks (r5: the separate seam-strip
    exchange of contour_segments cost a full all-to-all barrier that
    this path folds into the walk exchange).

    Plan: per tile, emit interior segments AND edge strips into a
    shared schema, both bucketed by hash(z, region) — a strip routes
    to the region containing its seam cells, so both partner strips
    and the neighboring interior segments co-locate.  The per-bucket
    kernel first expands strips into seam segments (grouped by seam
    key), then walks every (z, level, region) subgroup; stage 2
    stitches fragments per (z, level) exactly as assemble_polylines.
    Which region a boundary-exact segment is walked in differs from
    the unfused plan, but stitching makes the result walk-partition
    independent (the contour_polylines oracle checks component
    invariants)."""
    levels = [float(v) for v in levels]
    # pin the (small, aggregated) tile table: one streaming topology
    # from read->render->walk->stitch lets the reservation allocator
    # starve the exchanges (measured 13.3 s vs 5.3 s at sf0.1); the
    # materialize boundary matches contour_segments' plan
    tiles_ds = tiles_ds.materialize()
    seam_fn = seam_segments(levels, n_buckets)

    def _seg_region(x0):
        return (np.asarray(x0, np.float64) // region_px).astype(np.int64)

    def per_tile(batch: pa.Table) -> pa.Table:
        interior = _contour_interior_batch(batch, levels)
        strips = seam_strips(batch)
        n_i, n_s = len(interior), len(strips)
        region_i = _seg_region(interior["x0"].to_numpy(
            zero_copy_only=False))
        # strip -> region of its seam-cell origin (sx*TILE + ox)
        kind = strips["kind"].to_numpy(zero_copy_only=False)
        sx = strips["sx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ox = np.where(kind == _SEAM_H, 0, TILE - 1)
        region_s = (sx * TILE + ox) // region_px
        zi = interior["z"].to_numpy(zero_copy_only=False)
        zs = strips["z"].to_numpy(zero_copy_only=False)
        cb_i = _mix_to_bucket(zi, region_i, buckets=n_buckets)
        cb_s = _mix_to_bucket(zs, region_s, buckets=n_buckets)
        f64n = pa.nulls(n_s, pa.float64())
        t_i = pa.table({
            "z": interior["z"], "level": interior["level"],
            "x0": interior["x0"], "y0": interior["y0"],
            "x1": interior["x1"], "y1": interior["y1"],
            "skey": pa.nulls(n_i, pa.int64()),
            "kind": pa.nulls(n_i, pa.int8()),
            "sx": pa.nulls(n_i, pa.int32()),
            "sy": pa.nulls(n_i, pa.int32()),
            "side": pa.nulls(n_i, pa.int8()),
            "strip": pa.nulls(n_i, pa.binary()),
            "__cb": pa.array(cb_i),
        })
        t_s = pa.table({
            "z": strips["z"], "level": f64n,
            "x0": f64n, "y0": f64n, "x1": f64n, "y1": f64n,
            "skey": strips["skey"], "kind": strips["kind"],
            "sx": strips["sx"], "sy": strips["sy"],
            "side": strips["side"], "strip": strips["strip"],
            "__cb": pa.array(cb_s),
        })
        return pa.concat_tables([t_i, t_s])

    staged = tiles_ds.map_batches(per_tile, batch_format="pyarrow")

    seg_cols = ["z", "level", "x0", "y0", "x1", "y1"]

    def walk_bucket(g: pa.Table) -> pa.Table:
        is_strip = pc.is_valid(g["strip"])
        strips = g.filter(is_strip)
        parts = [g.filter(pc.invert(is_strip)).select(seg_cols)]
        if len(strips):
            parts.append(seam_fn(strips).select(seg_cols))
        segs = pa.concat_tables(parts)
        segs = segs.append_column(
            "region", pa.array(_seg_region(
                segs["x0"].to_numpy(zero_copy_only=False))))
        out = _split_apply(segs, ["z", "level", "region"],
                           assemble_group_polylines)
        z = out["z"].to_numpy(zero_copy_only=False)
        lv = _level_bits(out["level"].to_numpy(zero_copy_only=False))
        return out.append_column(
            "__sb", pa.array(_mix_to_bucket(z, lv, buckets=n_buckets)))

    fragments = staged.groupby("__cb").map_groups(
        walk_bucket, batch_format="pyarrow")

    def stitch_bucket(g: pa.Table) -> pa.Table:
        if "__sb" in g.column_names:
            g = g.drop_columns(["__sb"])
        return _split_apply(g, ["z", "level"], _stitch_fragments)

    return fragments.groupby("__sb").map_groups(
        stitch_bucket, batch_format="pyarrow")


def _stitch_fragments(g: pa.Table) -> pa.Table:
    """Stage 2: chain region fragments by matching endpoints.  CLOSED
    fragments pass through with ZERO decode work (they cannot extend —
    at scale they are ~all of the rows); only open fragments are
    decoded and concatenated (reversing as needed)."""
    from ..geom import wkb as _wkb

    closed_mask = g["closed"].to_numpy(zero_copy_only=False)
    passthrough = g.filter(pa.array(closed_mask))
    open_g = g.filter(pa.array(~closed_mask))
    n = len(open_g)
    if n == 0:
        return passthrough.set_column(
            passthrough.column_names.index("line_id"), "line_id",
            pa.array(np.arange(len(passthrough), dtype=np.int32)))
    g = open_g
    coords = [np.asarray(_wkb.decode(w)["coordinates"], dtype=np.float64)
              for w in g["wkb"].to_pylist()]

    def _pt_key(x, y) -> tuple:
        # (qx, qy) tuple key — see assemble_group_polylines
        q = _quant(np.array([x, y]))
        return (int(q[0]), int(q[1]))

    ka = [_pt_key(c[0, 0], c[0, 1]) for c in coords]
    kb = [_pt_key(c[-1, 0], c[-1, 1]) for c in coords]
    adj: dict[tuple, list[int]] = {}
    for i in range(n):
        adj.setdefault(ka[i], []).append(i)
        adj.setdefault(kb[i], []).append(i)
    used = np.zeros(n, dtype=bool)
    lines: list[np.ndarray] = []
    for i in range(n):
        if used[i]:
            continue
        # walk both directions from fragment i
        chain = coords[i]
        used[i] = True
        for end in (1, 0):  # forward from tail, then backward from head
            while True:
                key = _pt_key(chain[-1, 0], chain[-1, 1]) if end == 1 \
                    else _pt_key(chain[0, 0], chain[0, 1])
                cands = [s for s in adj.get(key, []) if not used[s]]
                if not cands:
                    break
                s = cands[0]
                used[s] = True
                piece = coords[s]
                if end == 1:
                    if ka[s] != key:
                        piece = piece[::-1]
                    chain = np.vstack([chain, piece[1:]])
                else:
                    if kb[s] != key:
                        piece = piece[::-1]
                    chain = np.vstack([piece[:-1], chain])
        lines.append(chain)
    z0 = g["z"][0].as_py() if n else 0
    lv0 = g["level"][0].as_py() if n else 0.0
    out_wkb, n_pts, closed = [], [], []
    for c in lines:
        out_wkb.append(_wkb.encode_linestring(c))
        n_pts.append(len(c))
        closed.append(bool(np.all(np.abs(c[0] - c[-1]) < 1e-9)))
    k = len(lines)
    stitched = pa.table({
        "z": pa.array(np.full(k, z0, dtype=np.int32)),
        "level": pa.array(np.full(k, lv0), pa.float64()),
        "line_id": pa.array(np.arange(k, dtype=np.int32)),
        "n_pts": pa.array(n_pts, pa.int64()),
        "closed": pa.array(closed, pa.bool_()),
        "wkb": pa.array(out_wkb, pa.binary()),
    })
    both = pa.concat_tables([passthrough.select(stitched.column_names),
                             stitched])
    return both.set_column(
        both.column_names.index("line_id"), "line_id",
        pa.array(np.arange(len(both), dtype=np.int32)))
