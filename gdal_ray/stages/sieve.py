"""Sieve filter — GDALSieveFilter semantics on the tile table.

The reference (alg/gdalsievefilter.cpp) removes raster polygons
(4-connected same-VALUE regions) smaller than ``threshold`` pixels by
merging each into its largest neighboring polygon, smallest regions
first, until none remain.  Re-expressed distributed:

1. per tile: same-value component labeling (vectorized min-label
   flood that only propagates across equal values) → comp summaries
   (value, n_pixels) + border records (packed seam key, value);
2. ONE bucketed exchange over seam keys emits (a) same-value merge
   edges and (b) different-value adjacency edges between border comps;
   in-tile adjacency edges are emitted during labeling;
3. the region graph (union-find over same-value edges, region sizes,
   region adjacency) is resolved on the driver — O(regions), the same
   economics as polygonize's equivalence resolution — and the
   reference's smallest-first merge loop runs on that graph;
4. the comp→final-value map is broadcast; each tile relabels
   (deterministic) and rewrites its pixels.

Output: tile rows (z, x, y, raster) with the sieved uint16 grid.
Note the background (value 0) is a region like any other, as in the
reference; pass ``protect_zero=True`` to pin it.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

TILE = 256
_INF = np.iinfo(np.int64).max


def label_components_by_value(grid: np.ndarray,
                              max_iters: int = 1024) -> np.ndarray:
    """4-connected min-label flood where labels only cross EQUAL
    values."""
    h, w = grid.shape
    lbl = np.arange(h * w).reshape(h, w).copy()
    for _ in range(max_iters):
        prev = lbl
        m = lbl.copy()
        eq = grid[1:, :] == grid[:-1, :]
        m[1:, :] = np.minimum(m[1:, :], np.where(eq, lbl[:-1, :], _INF))
        m[:-1, :] = np.minimum(m[:-1, :], np.where(eq, lbl[1:, :], _INF))
        eq = grid[:, 1:] == grid[:, :-1]
        m[:, 1:] = np.minimum(m[:, 1:], np.where(eq, lbl[:, :-1], _INF))
        m[:, :-1] = np.minimum(m[:, :-1], np.where(eq, lbl[:, 1:], _INF))
        lbl = m
        if np.array_equal(lbl, prev):
            break
    return lbl


def _pack_seam(vertical: bool, a: int, b: int) -> int:
    return (int(vertical) << 57) | (int(a) << 28) | int(b)


def _tile_pass(batch: pa.Table):
    """Label each tile; return comp rows, border rows, in-tile
    adjacency edges.  comp id = global pixel key of the component's
    min pixel (gy * 2^40 + gx)."""
    comp_rows = {k: [] for k in ("comp", "value", "n_pixels")}
    border_rows = {k: [] for k in ("edge_key", "comp", "value")}
    adj_rows = {"a": [], "b": []}
    per_tile = []
    for z, x, y, blob in zip(batch["z"].to_pylist(), batch["x"].to_pylist(),
                             batch["y"].to_pylist(),
                             batch["raster"].to_pylist()):
        grid = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
            .reshape(TILE, TILE).astype(np.int64)
        lbl = label_components_by_value(grid)
        gx0, gy0 = int(x) * TILE, int(y) * TILE
        yy, xx = np.mgrid[0:TILE, 0:TILE]
        gid = (gy0 + yy).astype(np.int64) * (1 << 40) + (gx0 + xx)
        # local label -> global comp id (min gid per label)
        flat_lbl = lbl.ravel()
        flat_gid = gid.ravel()
        order = np.argsort(flat_lbl, kind="stable")
        ls, gs = flat_lbl[order], flat_gid[order]
        starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
        ends = np.r_[starts[1:], len(ls)]
        comp_of_label = np.empty(len(starts), dtype=np.int64)
        uniq_labels = ls[starts]
        for i, (s, e) in enumerate(zip(starts, ends)):
            comp_of_label[i] = gs[s:e].min()
        lookup = np.searchsorted(uniq_labels, flat_lbl)
        comp_grid = comp_of_label[lookup].reshape(TILE, TILE)
        vals_flat = grid.ravel()[order]
        comp_rows["comp"].extend(comp_of_label.tolist())
        comp_rows["value"].extend(vals_flat[starts].tolist())
        comp_rows["n_pixels"].extend((ends - starts).tolist())
        # in-tile adjacency between DIFFERENT comps (any value pair)
        for s1, s2 in (((slice(1, None), slice(None)),
                        (slice(None, -1), slice(None))),
                       ((slice(None), slice(1, None)),
                        (slice(None), slice(None, -1)))):
            ca, cb = comp_grid[s1], comp_grid[s2]
            diff = ca != cb
            adj_rows["a"].extend(ca[diff].tolist())
            adj_rows["b"].extend(cb[diff].tolist())
        # border records on all 4 edges; skip world-boundary seams —
        # they have no neighbor tile, and packing coordinate -1 would
        # collapse every such edge onto one key ((a<<28)|-1) and emit
        # spurious cross-comp adjacency (contour's sx<0/sy<0 guard).
        world = TILE << int(z)
        gx = gx0 + np.arange(TILE, dtype=np.int64)
        gy = gy0 + np.arange(TILE, dtype=np.int64)
        for comps, vals, keys, in_world in (
            (comp_grid[:, 0], grid[:, 0],
             [_pack_seam(True, gx0 - 1, int(g)) for g in gy], gx0 > 0),
            (comp_grid[:, -1], grid[:, -1],
             [_pack_seam(True, gx0 + TILE - 1, int(g)) for g in gy],
             gx0 + TILE < world),
            (comp_grid[0, :], grid[0, :],
             [_pack_seam(False, int(g), gy0 - 1) for g in gx], gy0 > 0),
            (comp_grid[-1, :], grid[-1, :],
             [_pack_seam(False, int(g), gy0 + TILE - 1) for g in gx],
             gy0 + TILE < world),
        ):
            if not in_world:
                continue
            border_rows["edge_key"].extend(keys)
            border_rows["comp"].extend(comps.tolist())
            border_rows["value"].extend(vals.tolist())
        per_tile.append((z, x, y))
    return comp_rows, border_rows, adj_rows


def tile_records_batch(batch: pa.Table) -> pa.Table:
    comp, border, adj = _tile_pass(batch)
    nc, nb, na = len(comp["comp"]), len(border["comp"]), len(adj["a"])
    z64 = np.zeros
    return pa.table({
        "kind": pa.array(np.r_[np.zeros(nc, np.int8),
                               np.ones(nb, np.int8),
                               np.full(na, 2, np.int8)]),
        "comp": pa.array(np.r_[np.asarray(comp["comp"], np.int64),
                               np.asarray(border["comp"], np.int64),
                               np.asarray(adj["a"], np.int64)]),
        "value": pa.array(np.r_[np.asarray(comp["value"], np.int64),
                                np.asarray(border["value"], np.int64),
                                z64(na, np.int64)]),
        "n_pixels": pa.array(np.r_[np.asarray(comp["n_pixels"], np.int64),
                                   z64(nb + na, np.int64)]),
        "edge_key": pa.array(np.r_[z64(nc, np.int64),
                                   np.asarray(border["edge_key"], np.int64),
                                   z64(na, np.int64)]),
        "other": pa.array(np.r_[z64(nc + nb, np.int64),
                                np.asarray(adj["b"], np.int64)]),
    })


def _seam_edges(g: pa.Table) -> pa.Table:
    """One bucket of border rows → same-value merge edges + cross-value
    adjacency edges (vectorized per seam segment)."""
    key = g["edge_key"].to_numpy(zero_copy_only=False)
    comp = g["comp"].to_numpy(zero_copy_only=False)
    val = g["value"].to_numpy(zero_copy_only=False)
    order = np.lexsort((comp, key))
    k_s, c_s, v_s = key[order], comp[order], val[order]
    same = np.flatnonzero(k_s[1:] == k_s[:-1])
    ma, mb, aa, ab = [], [], [], []
    for i in same:
        if c_s[i] == c_s[i + 1]:
            continue
        if v_s[i] == v_s[i + 1]:
            ma.append(c_s[i])
            mb.append(c_s[i + 1])
        else:
            aa.append(c_s[i])
            ab.append(c_s[i + 1])
    return pa.table({
        "kind": pa.array(np.r_[np.zeros(len(ma), np.int8),
                               np.ones(len(aa), np.int8)]),
        "a": pa.array(np.r_[np.asarray(ma, np.int64),
                            np.asarray(aa, np.int64)]),
        "b": pa.array(np.r_[np.asarray(mb, np.int64),
                            np.asarray(ab, np.int64)]),
    })


class _UF:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, a):
        p = self.p.setdefault(a, a)
        while p != self.p[p]:
            self.p[p] = self.p[self.p[p]]
            p = self.p[p]
        self.p[a] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


def sieve(tiles_ds, threshold: int, protect_zero: bool = False,
          n_buckets: int | None = None):
    """Tile table → sieved tile table (same schema)."""
    import ray
    from ._pool import autoscale as _autoscale
    from ._pool import cluster_cpus

    B = n_buckets or max(16, cluster_cpus() * 2)
    # the rewrite pass consumes tiles_ds AGAIN after the graph is
    # resolved — materialize the (small) tile table once
    tiles_ds = tiles_ds.materialize()
    recs = tiles_ds.map_batches(tile_records_batch,
                                batch_format="pyarrow").materialize()

    borders = recs.filter(expr="kind == 1").map_batches(
        lambda b: b.append_column(
            "bucket", pa.array((b["edge_key"].to_numpy(zero_copy_only=False)
                                % B).astype(np.int32))),
        batch_format="pyarrow")
    seam = borders.groupby("bucket").map_groups(_seam_edges,
                                                batch_format="pyarrow")

    # --- driver-side region graph (O(regions + edges)) ---------------------
    uf = _UF()
    cross_adj: list[tuple[int, int]] = []
    for b in seam.iter_batches(batch_size=65536, batch_format="pyarrow"):
        kk = b["kind"].to_numpy(zero_copy_only=False)
        aa = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        for i in range(len(kk)):
            if kk[i] == 0:
                uf.union(int(aa[i]), int(bb[i]))
            else:
                cross_adj.append((int(aa[i]), int(bb[i])))
    sizes: dict[int, int] = {}
    value_of: dict[int, int] = {}
    for b in recs.filter(expr="kind == 0").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for c, v, n in zip(b["comp"].to_numpy(zero_copy_only=False),
                           b["value"].to_numpy(zero_copy_only=False),
                           b["n_pixels"].to_numpy(zero_copy_only=False)):
            r = uf.find(int(c))
            sizes[r] = sizes.get(r, 0) + int(n)
            value_of[r] = int(v)
    for b in recs.filter(expr="kind == 2").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for a_, b_ in zip(b["comp"].to_numpy(zero_copy_only=False),
                          b["other"].to_numpy(zero_copy_only=False)):
            cross_adj.append((int(a_), int(b_)))
    neigh: dict[int, set] = {}
    for a_, b_ in cross_adj:
        ra, rb = uf.find(a_), uf.find(b_)
        if ra == rb:
            continue
        neigh.setdefault(ra, set()).add(rb)
        neigh.setdefault(rb, set()).add(ra)

    # smallest-first merge loop (gdalsievefilter.cpp main pass)
    import heapq
    final_region: dict[int, int] = {}  # region -> surviving region

    def root(r):
        while r in final_region:
            r = final_region[r]
        return r

    heap = [(sz, r) for r, sz in sizes.items() if sz < threshold]
    heapq.heapify(heap)
    while heap:
        sz, r = heapq.heappop(heap)
        if r in final_region or sizes.get(r, 0) != sz \
                or sz >= threshold:
            continue
        if protect_zero and value_of[r] == 0:
            continue
        cands = {root(nb) for nb in neigh.get(r, ())} - {r}
        if not cands:
            continue
        # largest neighbor wins, ties → smallest region id
        tgt = max(cands, key=lambda n: (sizes.get(n, 0), -n))
        final_region[r] = tgt
        sizes[tgt] = sizes.get(tgt, 0) + sz
        sizes.pop(r, None)
        merged = neigh.pop(r, set())
        tset = neigh.setdefault(tgt, set())
        for nb in merged:
            rn = root(nb)
            if rn != tgt:
                tset.add(rn)
                neigh.setdefault(rn, set()).add(tgt)
        if sizes[tgt] < threshold:
            heapq.heappush(heap, (sizes[tgt], tgt))

    # broadcast the raw graphs; workers resolve comp → union root →
    # final (post-merge) region → value.  Regions untouched by the
    # merge loop resolve to themselves and keep their own value.
    map_ref = ray.put((uf.p, final_region, value_of))

    class Rewrite:
        def __init__(self, map_ref):
            p, fin, vof = ray.get(map_ref) \
                if isinstance(map_ref, ray.ObjectRef) else map_ref
            self.p, self.fin, self.vof = p, fin, vof

        def _root(self, c):
            p = self.p
            while c in p and p[c] != c:
                c = p[c]
            while c in self.fin:
                c = self.fin[c]
            return c

        def __call__(self, b: pa.Table) -> pa.Table:
            outs = []
            for z, x, y, blob in zip(b["z"].to_pylist(),
                                     b["x"].to_pylist(),
                                     b["y"].to_pylist(),
                                     b["raster"].to_pylist()):
                grid = np.frombuffer(zlib.decompress(blob), dtype=">u2") \
                    .reshape(TILE, TILE).astype(np.int64)
                lbl = label_components_by_value(grid)
                gx0, gy0 = int(x) * TILE, int(y) * TILE
                yy, xx = np.mgrid[0:TILE, 0:TILE]
                gid = (gy0 + yy).astype(np.int64) * (1 << 40) + (gx0 + xx)
                flat_lbl = lbl.ravel()
                order = np.argsort(flat_lbl, kind="stable")
                ls = flat_lbl[order]
                starts = np.flatnonzero(np.r_[True, ls[1:] != ls[:-1]])
                ends = np.r_[starts[1:], len(ls)]
                gsort = gid.ravel()[order]
                uniq_labels = ls[starts]
                # per local comp: final value via the broadcast maps
                vals = grid.ravel()[order][starts]
                out_vals = np.empty(len(starts), dtype=np.int64)
                for i, (s, e) in enumerate(zip(starts, ends)):
                    comp = int(gsort[s:e].min())
                    fr = self._root(comp)
                    out_vals[i] = self.vof.get(fr, int(vals[i]))
                lookup = np.searchsorted(uniq_labels, flat_lbl)
                new_grid = out_vals[lookup].reshape(TILE, TILE)
                outs.append(zlib.compress(
                    np.clip(new_grid, 0, 65535).astype(">u2").tobytes(), 6))
            t = {c: b[c] for c in b.column_names if c != "raster"}
            t["raster"] = pa.array(outs, pa.binary())
            return pa.table(t)

    return tiles_ds.map_batches(
        Rewrite, fn_constructor_kwargs=dict(map_ref=map_ref),
        batch_format="pyarrow", concurrency=_autoscale(None))
