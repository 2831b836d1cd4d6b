"""Packed STR (sort-tile-recursive) bounding-box tree, pure numpy.

Plays the role of the GEOS STRtree the reference builds over zone /
method-layer features (alg/zonal.cpp:1372-1450; strtree spatial sort
apps/gdalalg_vector_sort.cpp:393-500).  Bulk-loaded once (typically in
an actor's ``__init__`` over a broadcast layer), then queried per batch.

Queries are vectorized per tree level: a bbox (or point) query descends
the packed level arrays with numpy set operations, no per-node Python
recursion.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Static bbox tree; leaves reference item indices 0..n-1."""

    def __init__(self, bounds: np.ndarray, node_capacity: int = 10):
        """bounds: (n, 4) array of (minx, miny, maxx, maxy)."""
        b = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
        self.n = len(b)
        self.node_capacity = node_capacity
        # STR packing: sort by x-center, slice into vertical strips,
        # sort each strip by y-center → leaf order
        if self.n:
            cx = (b[:, 0] + b[:, 2]) * 0.5
            cy = (b[:, 1] + b[:, 3]) * 0.5
            order = np.argsort(cx, kind="stable")
            nleaf = int(np.ceil(self.n / node_capacity))
            nstrips = max(1, int(np.ceil(np.sqrt(nleaf))))
            strip_sz = int(np.ceil(self.n / nstrips))
            pieces = []
            for s in range(0, self.n, strip_sz):
                strip = order[s : s + strip_sz]
                pieces.append(strip[np.argsort(cy[strip], kind="stable")])
            self.leaf_items = np.concatenate(pieces)
        else:
            self.leaf_items = np.empty(0, dtype=np.int64)
        self.item_bounds = b
        # build packed levels bottom-up; each level is (m, 4) bounds +
        # slice mapping into the level below
        levels = []
        cur = b[self.leaf_items] if self.n else b
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / node_capacity))
            pad = m * node_capacity - len(cur)
            padded = np.vstack(
                [cur, np.tile([np.inf, np.inf, -np.inf, -np.inf], (pad, 1))]
            ).reshape(m, node_capacity, 4)
            nxt = np.empty((m, 4))
            nxt[:, 0] = padded[:, :, 0].min(axis=1)
            nxt[:, 1] = padded[:, :, 1].min(axis=1)
            nxt[:, 2] = padded[:, :, 2].max(axis=1)
            nxt[:, 3] = padded[:, :, 3].max(axis=1)
            levels.append(cur)
            cur = nxt
        levels.append(cur)
        self.levels = levels[::-1]  # root first; levels[-1] = leaf-entry bounds

    def query_bbox(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Item indices whose bounds intersect the query bbox."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        cap = self.node_capacity
        cand = np.array([0], dtype=np.int64)  # node ids at current level
        for lvl in range(len(self.levels)):
            b = self.levels[lvl]
            if lvl > 0:
                # expand candidate parents into child slots
                child = (cand[:, None] * cap + np.arange(cap)[None, :]).ravel()
                cand = child[child < len(b)]
            bb = b[cand]
            hit = (
                (bb[:, 0] <= maxx)
                & (bb[:, 2] >= minx)
                & (bb[:, 1] <= maxy)
                & (bb[:, 3] >= miny)
            )
            cand = cand[hit]
            if len(cand) == 0:
                return np.empty(0, dtype=np.int64)
        return np.sort(self.leaf_items[cand])

    def query_point(self, x: float, y: float) -> np.ndarray:
        return self.query_bbox(x, y, x, y)
