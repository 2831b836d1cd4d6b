"""Broadcast spatial join — the engine's layer-algebra core.

Re-expresses ``OGRLayer::Intersection`` and its siblings
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-5629 Intersection, :5803
Union, :6770 Identity, :7537 Clip, :7846 Erase) as a Ray-Data-native
broadcast join:

- the method (polygon) layer is small: it is ``ray.put`` once and every
  ``SpatialJoiner`` actor builds its immutable index in ``__init__`` —
  the Ray analog of the reference's prepared geometries
  (``OGRCreatePreparedGeometry``, ogrlayer.cpp:5512-5520) and
  zone STRtree (alg/zonal.cpp:1372-1450);
- candidate pruning is two-phase exactly like the reference's
  ``FilterGeometry`` (ogrlayer.cpp:4004-4075): phase 1 a cell/envelope
  overlap test (here: a Morton-cell → polygon-ids covering map, the
  vectorized equivalent of the envelope check at :5465-5487), phase 2
  the exact point-in-polygon predicate;
- the output schema follows the reference's merge rule
  (``set_result_schema``, ogrlayer.cpp:5117-5199, asserted by
  autotest/ogr/ogr_layer_algebra.py:163-172): input fields then method
  fields, name collisions prefixed ``input_`` / ``method_``.

For point payloads the geometric intersection of a page-point with a
polygon is the point itself, so ``intersection`` emits one row per
(point, covering polygon) pair — input fields ++ method fields — and
empty intersections are dropped (ogrlayer.cpp:5580-5588).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

import ray

from ._pool import autoscale as _autoscale

from ..geom import cells as _cells
from ..geom import predicates as _pred
from ..geom import strtree as _strtree
from ..geom import wkb as _wkb


def _polygon_bounds(blobs: list[bytes]) -> np.ndarray:
    out = np.empty((len(blobs), 4))
    preps = []
    for i, b in enumerate(blobs):
        p = _pred.PreparedPolygon.from_wkb(b)
        preps.append(p)
        out[i] = p.bounds
    return out, preps


def _auto_level(bounds: np.ndarray, max_level: int = 14) -> int:
    """Pick the cell level where a typical polygon bbox spans ~1-4 tiles:
    tile span (360/2^L degrees) ≈ median bbox width."""
    if not len(bounds):
        return 4
    w = np.median(np.maximum(bounds[:, 2] - bounds[:, 0],
                             bounds[:, 3] - bounds[:, 1]))
    w = max(w, 1e-9)
    lvl = int(np.clip(np.floor(np.log2(360.0 / w)), 0, max_level))
    return lvl


class SpatialJoinIndex:
    """Immutable index over a polygon layer (built once per actor)."""

    # bbox coverings larger than this many cells are not enumerated;
    # such "broad" polygons (continent/world-spanning) are pruned by a
    # direct vectorized bbox mask per batch instead — same two-phase
    # contract, bounded index size regardless of polygon extent.
    MAX_CELLS_PER_POLYGON = 4096

    # each polygon is indexed at ITS OWN level (multi-resolution
    # covering, as S2 cell coverings do): a small urban district sits in
    # fine cells so it is only a candidate for points in its own block,
    # while a country-sized polygon sits in a few coarse cells.  A
    # single shared level would either flood hot cells with hundreds of
    # candidates (level too coarse for small polys) or explode the
    # covering of big polys (too fine).
    MIN_LEVEL = 2
    MAX_LEVEL = 16

    def __init__(self, poly_table: pa.Table, geometry_col: str = "geometry",
                 level: int | None = None):
        self.table = poly_table
        self.geometry_col = geometry_col
        blobs = poly_table[geometry_col].to_pylist()
        self.bounds, self.prepared = _polygon_bounds(blobs)
        self.tree = _strtree.STRtree(self.bounds)
        # per-poly covering level, fully vectorized
        b = self.bounds
        finite = np.isfinite(b[:, 0])
        if level is not None:
            lvls = np.full(len(b), level, dtype=np.int64)
        else:
            w = np.maximum(np.maximum(b[:, 2] - b[:, 0],
                                      b[:, 3] - b[:, 1]), 1e-9)
            # tile span 360/2^L ≈ bbox width → poly covers ~1-4 cells
            with np.errstate(invalid="ignore"):
                lvls = np.clip(np.floor(np.log2(360.0 / w)),
                               self.MIN_LEVEL, self.MAX_LEVEL)
            lvls = np.where(np.isfinite(lvls), lvls, self.MIN_LEVEL) \
                .astype(np.int64)
        # level -> {cell -> candidate pid array}; corner tiles computed
        # ONCE per level over all its polygons (vectorized — a per-poly
        # scalar tile call costs ~100 µs × n_polys)
        per_level: dict[int, dict[int, list[int]]] = defaultdict(
            lambda: defaultdict(list))
        broad = []
        for lvl in np.unique(lvls[finite]):
            sel = np.nonzero(finite & (lvls == lvl))[0]
            tx0, ty0 = _cells.tiles.lonlat_to_tile(b[sel, 0], b[sel, 1],
                                                   int(lvl))
            tx1, ty1 = _cells.tiles.lonlat_to_tile(b[sel, 2], b[sel, 3],
                                                   int(lvl))
            x0 = np.minimum(tx0, tx1)
            x1 = np.maximum(tx0, tx1)
            y0 = np.minimum(ty0, ty1)
            y1 = np.maximum(ty0, ty1)
            ncells = (x1 - x0 + 1) * (y1 - y0 + 1)
            cmap = per_level[int(lvl)]
            txs: list[int] = []
            tys: list[int] = []
            pids: list[int] = []
            for i, pid in enumerate(sel):
                if ncells[i] > self.MAX_CELLS_PER_POLYGON:
                    broad.append(int(pid))
                    continue
                for tx in range(int(x0[i]), int(x1[i]) + 1):
                    for ty in range(int(y0[i]), int(y1[i]) + 1):
                        txs.append(tx)
                        tys.append(ty)
                        pids.append(int(pid))
            if not txs:
                continue
            # ONE vectorized cell encode per level (scalar morton calls
            # cost ~70 µs each — 10^4 cells would be >1 s)
            cell_ids = _cells.tile_to_cell(
                np.asarray(txs, dtype=np.int64),
                np.asarray(tys, dtype=np.int64), int(lvl))
            for c, pid in zip(cell_ids.tolist(), pids):
                cmap[c].append(pid)
        self.level_maps = {
            lvl: {k: np.asarray(v, dtype=np.int32) for k, v in cmap.items()}
            for lvl, cmap in per_level.items()}
        self.broad_ids = np.asarray(broad, dtype=np.int64)
        # kept for introspection/tests: the finest level in use
        self.level = max(self.level_maps) if self.level_maps else 4

    def candidate_pairs(self, lon: np.ndarray, lat: np.ndarray):
        """Phase-1 pruning: (row_idx, poly_id) candidate pairs via the
        multi-level cell covering maps.  O(n log n) per level in use:
        rows are grouped per cell by one argsort + slice (NOT a per-cell
        `inv == ui` scan, which is O(n · unique_cells) and turns big
        batches quadratic).  Candidate arrays are int32 — at 32-wide
        parallelism the candidate gathers are DRAM-bandwidth-bound, and
        halving the element size measurably lifts the high-CPU scaling
        pair (BASELINE.md)."""
        rows_out, polys_out = [], []
        for lvl, cmap in self.level_maps.items():
            cell = _cells.lonlat_to_cell(lon, lat, lvl)
            order = np.argsort(cell, kind="stable").astype(np.int32)
            sorted_cells = cell[order]
            uniq, starts = np.unique(sorted_cells, return_index=True)
            ends = np.append(starts[1:], len(sorted_cells))
            for ui, c in enumerate(uniq):
                pids = cmap.get(int(c))
                if pids is None:
                    continue
                rows = order[starts[ui]:ends[ui]]
                rows_out.append(np.repeat(rows, len(pids)))
                polys_out.append(np.tile(pids, len(rows)))
        for pid in self.broad_ids:
            in_bbox = np.nonzero(self.prepared[pid].bbox_mask(lon, lat))[0]
            if len(in_bbox):
                rows_out.append(in_bbox.astype(np.int32))
                polys_out.append(np.full(len(in_bbox), pid, dtype=np.int32))
        if not rows_out:
            return (np.empty(0, dtype=np.int32),) * 2
        return np.concatenate(rows_out), np.concatenate(polys_out)

    def match_pairs(self, lon: np.ndarray, lat: np.ndarray,
                    predicate: str = "intersects"):
        """Exact (row_idx, poly_id) matches.  predicate: 'intersects'
        (boundary inclusive, the GEOS Intersects of a point) or 'within'
        (interior only)."""
        rows, polys = self.candidate_pairs(lon, lat)
        if not len(rows):
            return rows, polys
        order = np.argsort(polys, kind="stable").astype(np.int32)
        rows_s, polys_s = rows[order], polys[order]
        uniq_p = np.unique(polys_s)
        starts = np.searchsorted(polys_s, uniq_p)
        bounds_idx = np.append(starts, len(polys_s))
        out_rows, out_polys = [], []
        for i, pid in enumerate(uniq_p):
            r = rows_s[bounds_idx[i] : bounds_idx[i + 1]]
            prep = self.prepared[pid]
            # phase 1b: envelope; phase 2: exact PIP (two-phase filter,
            # ogrlayer.cpp:4004-4075)
            m = prep.bbox_mask(lon[r], lat[r])
            if not m.any():
                continue
            sub = r[m]
            if predicate == "within":
                hit = prep.contains_properly(lon[sub], lat[sub])
            else:
                hit = prep.covers(lon[sub], lat[sub])
            matched = sub[hit]
            if len(matched):
                out_rows.append(matched)
                out_polys.append(np.full(len(matched), pid, dtype=np.int32))
        if not out_rows:
            return (np.empty(0, dtype=np.int32),) * 2
        return np.concatenate(out_rows), np.concatenate(out_polys)


def merge_schemas(input_table: pa.Table, method_table: pa.Table,
                  geometry_col: str = "geometry",
                  input_prefix: str = "input_",
                  method_prefix: str = "method_") -> tuple[list, list]:
    """The reference's join-output schema rule (set_result_schema,
    ogrlayer.cpp:5117-5199): all input fields, then all method fields
    (method geometry excluded for point payloads — the intersection
    geometry IS the point); colliding names get both sides prefixed."""
    in_names = list(input_table.column_names)
    m_names = [c for c in method_table.column_names if c != geometry_col]
    collisions = set(in_names) & set(m_names)
    out_in = [(c, input_prefix + c if c in collisions else c) for c in in_names]
    out_m = [(c, method_prefix + c if c in collisions else c) for c in m_names]
    return out_in, out_m


class SpatialJoiner:
    """Actor-pool callable: pages batch → join rows.

    Use: ``ds.map_batches(SpatialJoiner, fn_constructor_kwargs=dict(
    polygons_ref=ray.put(poly_table)), batch_format="pyarrow",
    concurrency=N, batch_size=B)``.

    operation: 'intersection' (inner join, merged schema),
    'clip'/'semi' (input schema, rows matching ≥1 polygon),
    'erase'/'anti' (input schema, rows matching none),
    'identity' (left join: matched rows get method fields, unmatched
    get nulls — ogrlayer.cpp:6770 Identity for point inputs).
    """

    def __init__(self, polygons_ref, operation: str = "intersection",
                 predicate: str = "intersects", geometry_col: str = "geometry",
                 lon_col: str = "lon", lat_col: str = "lat",
                 level: int | None = None,
                 input_prefix: str = "input_", method_prefix: str = "method_"):
        obj = ray.get(polygons_ref) if isinstance(polygons_ref, ray.ObjectRef) \
            else polygons_ref
        if isinstance(obj, SpatialJoinIndex):
            # prebuilt broadcast index (built ONCE on the driver;
            # workers pay only the deserialize, not the build)
            self.index = obj
            table = obj.table
        else:
            table = obj
            self.index = SpatialJoinIndex(table, geometry_col, level)
        self.operation = operation
        self.predicate = predicate
        self.lon_col, self.lat_col = lon_col, lat_col
        self.geometry_col = geometry_col
        self.input_prefix, self.method_prefix = input_prefix, method_prefix
        self.method_table = table

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        rows, polys = self.index.match_pairs(lon, lat, self.predicate)
        op = self.operation
        if op in ("clip", "semi"):
            sel = np.unique(rows)
            return batch.take(pa.array(sel, pa.int64()))
        if op in ("erase", "anti"):
            mask = np.ones(len(batch), dtype=bool)
            mask[rows] = False
            return batch.filter(pa.array(mask))
        out_in, out_m = merge_schemas(batch, self.method_table,
                                      self.geometry_col,
                                      self.input_prefix, self.method_prefix)
        if op == "identity":
            matched = np.zeros(len(batch), dtype=bool)
            matched[rows] = True
            un = np.nonzero(~matched)[0].astype(np.int32)
            rows = np.concatenate([rows, un])
            polys = np.concatenate([polys, np.full(len(un), -1,
                                                   dtype=np.int32)])
        elif op != "intersection":
            raise ValueError(f"unknown operation {op}")
        order = np.argsort(rows, kind="stable")
        rows, polys = rows[order], polys[order]
        left = batch.take(pa.array(rows))
        cols = {new: left[old] for old, new in out_in}
        # method fields gathered by poly id — vectorized masked take
        # (−1 → null for identity); never a per-row Python list comp
        take_idx = pa.array(polys.astype(np.int64), mask=polys < 0)
        for old, new in out_m:
            cols[new] = self.method_table[old].take(take_idx)
        return pa.table(cols)


# per-worker-process joiner cache: a task-pool join stage builds the
# index once per Ray worker PROCESS (workers are reused across tasks),
# keyed by the broadcast table's ObjectRef.  Same build-once economics
# as an actor pool, but tasks schedule elastically — no pool sizing, no
# CPU reservation starving sibling stages on small clusters.
_JOINER_CACHE: dict = {}
_JOINER_CACHE_MAX = 3  # small LRU: two alternating join layers must
# not thrash the per-worker index (VERDICT r1 #10); 3 bounds memory


def _cached_joiner(polygons_ref, kwargs_key, **kwargs) -> "SpatialJoiner":
    key = (polygons_ref.hex() if isinstance(polygons_ref, ray.ObjectRef)
           else id(polygons_ref), kwargs_key)
    j = _JOINER_CACHE.pop(key, None)
    if j is None:
        j = SpatialJoiner(polygons_ref, **kwargs)
        while len(_JOINER_CACHE) >= _JOINER_CACHE_MAX:
            _JOINER_CACHE.pop(next(iter(_JOINER_CACHE)))
    _JOINER_CACHE[key] = j  # (re-)insert at MRU position
    return j


def build_index(poly_table: pa.Table, geometry_col: str = "geometry",
                level: int | None = None) -> SpatialJoinIndex:
    """Build the broadcastable join index once (reusable across several
    spatial_join calls over the same method layer)."""
    return SpatialJoinIndex(poly_table, geometry_col, level)


def spatial_join(ds, poly_table: pa.Table, operation: str = "intersection",
                 predicate: str = "intersects", concurrency=None,
                 batch_size: int | None = None, num_cpus: float = 1,
                 index: SpatialJoinIndex | None = None, **kwargs):
    """Dataset-level entry: broadcast poly_table once (``ray.put``), join
    via map_batches (stateful stage per SURVEY.md §2.3).

    concurrency=None (default) → task pool with a per-worker-process
    index cache (elastic); an int/tuple → explicit actor pool.  In both
    modes the index is built ONCE driver-side and broadcast prebuilt —
    workers deserialize (~100 ms) instead of rebuilding (seconds for
    10^4-polygon layers).  Pass ``index=build_index(...)`` to share one
    build across several joins on the same layer."""
    if index is None:
        index = SpatialJoinIndex(poly_table, kwargs.get("geometry_col",
                                                        "geometry"),
                                 kwargs.pop("level", None))
    else:
        kwargs.pop("level", None)
        # rebind the output table (e.g. a projected column subset of the
        # same layer) without rebuilding geometry structures
        if index.table is not poly_table:
            import copy

            index = copy.copy(index)
            index.table = poly_table
    ref = ray.put(index)
    ckwargs = dict(polygons_ref=ref, operation=operation,
                   predicate=predicate, **kwargs)
    if concurrency is not None:
        return ds.map_batches(
            SpatialJoiner,
            fn_constructor_kwargs=ckwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=_autoscale(concurrency),
            num_cpus=num_cpus,
        )
    kkey = (operation, predicate, tuple(sorted(kwargs.items())))
    jkwargs = dict(operation=operation, predicate=predicate, **kwargs)

    def join_batch(batch: pa.Table) -> pa.Table:
        return _cached_joiner(ref, kkey, **jkwargs)(batch)

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          batch_size=batch_size, num_cpus=num_cpus)
