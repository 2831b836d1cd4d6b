"""Linear referencing (ogrlineref, apps/ogrlineref.cpp): locate
points against a reference polyline (the -get_pos operation — measure
of the nearest point along the line) and create mileposts at fixed
steps (-create).

Locate semantics: for each point, project onto every segment
(t = clamp(dot / |seg|², 0, 1)), take the segment with the smallest
squared distance — ties (exactly equal at shared vertices, where both
adjacent segments project to the same vertex bit-exactly) resolve to
the LOWEST segment index, the order the reference scans parts.
measure = prefix_length(seg) + t · len(seg).

The line is tiny and broadcast inside the closure; each batch
vectorizes points × segments in numpy — no shuffle at all, the
classic map-only referencing pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _segments(line_xy):
    v = np.asarray(line_xy, dtype=np.float64)
    if v.ndim != 2 or len(v) < 2:
        raise ValueError("line needs >= 2 vertices")
    x1, y1 = v[:-1, 0], v[:-1, 1]
    dx, dy = v[1:, 0] - x1, v[1:, 1] - y1
    len2 = dx * dx + dy * dy
    if (len2 == 0).any():
        raise ValueError("zero-length segment")
    seglen = np.sqrt(len2)
    cum0 = np.r_[0.0, np.cumsum(seglen)[:-1]]
    return x1, y1, dx, dy, len2, seglen, cum0


def line_locate_batch(line_xy, lon_col: str = "lon",
                      lat_col: str = "lat"):
    x1, y1, dx, dy, len2, seglen, cum0 = _segments(line_xy)

    def fn(batch: pa.Table) -> pa.Table:
        px = batch[lon_col].to_numpy(zero_copy_only=False)
        py = batch[lat_col].to_numpy(zero_copy_only=False)
        t = ((px[:, None] - x1) * dx + (py[:, None] - y1) * dy) / len2
        t = np.clip(t, 0.0, 1.0)
        ddx = px[:, None] - (x1 + t * dx)
        ddy = py[:, None] - (y1 + t * dy)
        d2 = ddx * ddx + ddy * ddy
        seg = np.argmin(d2, axis=1)          # first minimum on ties
        rows = np.arange(len(px))
        tb = t[rows, seg]
        measure = cum0[seg] + tb * seglen[seg]
        dist = np.sqrt(d2[rows, seg])
        out = pa.table({c: batch[c] for c in batch.column_names})
        out = out.append_column("seg", pa.array(seg.astype(np.int64)))
        out = out.append_column("measure",
                                pa.array(measure, pa.float64()))
        out = out.append_column("line_dist",
                                pa.array(dist, pa.float64()))
        return out
    return fn


def line_locate(ds, line_xy, lon_col: str = "lon",
                lat_col: str = "lat"):
    return ds.map_batches(line_locate_batch(line_xy, lon_col, lat_col),
                          batch_format="pyarrow")


def create_mileposts(line_xy, step: float):
    """ogrlineref -create: points every ``step`` along the line (from
    measure 0 to total length inclusive of the start, exclusive past
    the end), returned as (k, measure, x, y) rows."""
    x1, y1, dx, dy, len2, seglen, cum0 = _segments(line_xy)
    total = float(cum0[-1] + seglen[-1])
    ms = np.arange(0.0, total, float(step))
    seg = np.minimum(np.searchsorted(cum0 + seglen, ms, side="right"),
                     len(seglen) - 1)
    t = (ms - cum0[seg]) / seglen[seg]
    return [
        {"k": int(i), "measure": float(m),
         "x": float(x1[s] + t_ * dx[s]),
         "y": float(y1[s] + t_ * dy[s])}
        for i, (m, s, t_) in enumerate(zip(ms, seg, t))
    ]
