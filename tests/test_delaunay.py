"""Delaunay / linear gridding property tests (GDALGridLinear
semantics: exact on affine fields, NODATA outside the hull)."""

import numpy as np
import pyarrow as pa

from gdal_ray.geom.delaunay import (
    LinearInterpolator,
    _circumcircle_contains,
    delaunay,
)


def test_delaunay_empty_circumcircles():
    rs = np.random.RandomState(2)
    pts = rs.uniform(0, 10, (40, 2))
    tris = delaunay(pts)
    assert len(tris) > 0
    for t in tris:
        for i in range(len(pts)):
            if i not in t:
                assert not _circumcircle_contains(pts[list(t)], pts[i])


def test_linear_interp_exact_on_affine():
    rs = np.random.RandomState(3)
    pts = rs.uniform(0, 10, (60, 2))
    a, b, c = 2.0, 0.7, -1.3
    z = a + b * pts[:, 0] + c * pts[:, 1]
    li = LinearInterpolator(pts[:, 0], pts[:, 1], z)
    q = rs.uniform(2, 8, (400, 2))
    got = li(q[:, 0], q[:, 1])
    expect = a + b * q[:, 0] + c * q[:, 1]
    inside = ~np.isnan(got)
    assert inside.mean() > 0.9
    np.testing.assert_allclose(got[inside], expect[inside], atol=1e-9)
    # outside the hull → NaN
    assert np.isnan(li(np.array([1e3]), np.array([1e3]))[0])


def test_grid_linear_stage(ray_session):
    import ray.data as rd

    from gdal_ray.stages.knn import grid_linear

    rs = np.random.RandomState(4)
    n = 30
    refs = pa.table({
        "ref_id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(rs.uniform(-50, 50, n)),
        "y": pa.array(rs.uniform(-30, 30, n)),
        "val": pa.array(rs.uniform(0, 10, n)),
    })
    nodes = pa.table({
        "node_id": pa.array(np.arange(100, dtype=np.int64)),
        "lon": pa.array(rs.uniform(-60, 60, 100)),
        "lat": pa.array(rs.uniform(-40, 40, 100)),
    })
    out = grid_linear(rd.from_arrow(nodes), refs,
                      value_col="val").to_pandas()
    # interpolated values are bounded by the ref value range
    v = out["linear"].dropna()
    assert len(v) > 10
    assert (v >= -1e-9).all() and (v <= 10 + 1e-9).all()
