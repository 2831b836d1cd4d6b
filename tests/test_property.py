"""Property-based kernel tests (hypothesis) — algebraic invariants that
hold for ALL inputs, complementing the fixed goldens."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_ray.geom import tiles as _tiles
from gdal_ray.geom.clip import (
    convex_difference_pieces,
    ear_clip_triangulate,
    pieces_area,
    ring_area,
    sh_clip,
)

finite_lon = st.floats(min_value=-179.999, max_value=179.999,
                       allow_nan=False)
finite_lat = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(finite_lon, finite_lat, st.integers(min_value=0, max_value=14))
def test_tile_pixel_consistent_with_tile(lon, lat, z):
    """tile_pixel's tile always equals lonlat_to_tile's tile — the
    invariant whose violation was round 2's HIGH bug."""
    tx1, ty1 = _tiles.lonlat_to_tile(lon, lat, z)
    tx2, ty2, col, row = _tiles.tile_pixel(lon, lat, z)
    assert int(tx1) == int(tx2) and int(ty1) == int(ty2)
    assert 0 <= int(col) < 256 and 0 <= int(row) < 256


@settings(max_examples=200, deadline=None)
@given(finite_lon, finite_lat, st.integers(min_value=1, max_value=14))
def test_parent_tile_halves_indices(lon, lat, z):
    tx, ty = _tiles.lonlat_to_tile(lon, lat, z)
    px, py = _tiles.parent_tile(tx, ty, z)
    tx1, ty1 = _tiles.lonlat_to_tile(lon, lat, z - 1)
    assert int(px) == int(tx1) and int(py) == int(ty1)


def _rand_box(draw):
    x0 = draw(st.floats(min_value=-50, max_value=40, allow_nan=False))
    y0 = draw(st.floats(min_value=-50, max_value=40, allow_nan=False))
    w = draw(st.floats(min_value=0.5, max_value=30, allow_nan=False))
    h = draw(st.floats(min_value=0.5, max_value=30, allow_nan=False))
    return np.array([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                     (x0, y0 + h)], float)


@st.composite
def box_pairs(draw):
    return _rand_box(draw), _rand_box(draw)


@settings(max_examples=200, deadline=None)
@given(box_pairs())
def test_clip_partition_conservation(pair):
    """area(A ∩ B) + area(A \\ B) == area(A) for random rectangles —
    the partition property the whole layer algebra rests on."""
    A, B = pair
    inter = abs(ring_area(sh_clip(A, B)))
    diff = pieces_area(convex_difference_pieces(A, B))
    assert abs(inter + diff - abs(ring_area(A))) < 1e-6


@st.composite
def star_polygons(draw):
    """Random star-shaped (simple, usually concave) polygon around the
    origin: vertices at increasing angles with random radii."""
    n = draw(st.integers(min_value=4, max_value=12))
    radii = [draw(st.floats(min_value=1.0, max_value=10.0,
                            allow_nan=False)) for _ in range(n)]
    base = np.sort(np.linspace(0, 2 * np.pi, n, endpoint=False))
    pts = np.column_stack([radii * np.cos(base), radii * np.sin(base)])
    return pts


@settings(max_examples=100, deadline=None)
@given(star_polygons())
def test_ear_clip_partitions_star_polygons(poly):
    """Triangulation of a random star polygon partitions it: area sum
    matches and triangles are pairwise disjoint."""
    tris = ear_clip_triangulate(poly)
    target = abs(ring_area(poly))
    assert abs(pieces_area(tris) - target) < 1e-6 * max(target, 1.0)
    for i, a in enumerate(tris):
        for b in tris[i + 1:]:
            assert abs(ring_area(sh_clip(a, b))) < 1e-6


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(finite_lon, finite_lat), min_size=1,
                max_size=50), st.integers(min_value=2, max_value=10))
def test_render_pixel_identity(points, z):
    """Every point's (tile, pixel) at z equals its tile at z+8 — the
    identity the raster oracles rely on."""
    lon = np.array([p[0] for p in points])
    lat = np.array([p[1] for p in points])
    tx, ty, col, row = _tiles.tile_pixel(lon, lat, z)
    gx8, gy8 = _tiles.lonlat_to_tile(lon, lat, z + 8)
    np.testing.assert_array_equal(tx * 256 + col, gx8)
    np.testing.assert_array_equal(ty * 256 + row, gy8)


# --- WHERE-compiler vs DuckDB on randomized expressions -------------------


@st.composite
def where_clauses(draw):
    """Random WHERE over columns a (int), b (float), s (string)."""
    def atom():
        kind = draw(st.sampled_from(
            ["cmp_a", "cmp_b", "in_a", "between_a", "like_s", "null_b",
             "fn_abs", "fn_len", "fn_upper"]))
        if kind == "cmp_a":
            op = draw(st.sampled_from(["=", "<>", "<", ">", "<=", ">="]))
            return f"a {op} {draw(st.integers(0, 9))}"
        if kind == "fn_abs":
            # scalar functions are legal in WHERE position too
            return f"ABS(a - {draw(st.integers(0, 9))}) " \
                   f"{draw(st.sampled_from(['<', '>=']))} " \
                   f"{draw(st.integers(0, 5))}"
        if kind == "fn_len":
            return f"LENGTH(s) = {draw(st.integers(2, 3))}"
        if kind == "fn_upper":
            return "UPPER(s) = 'XYZ'"
        if kind == "cmp_b":
            op = draw(st.sampled_from(["<", ">", "<=", ">="]))
            return f"b {op} {draw(st.integers(0, 9))}.5"
        if kind == "in_a":
            vals = draw(st.lists(st.integers(0, 9), min_size=1,
                                 max_size=4))
            return f"a IN ({', '.join(map(str, vals))})"
        if kind == "between_a":
            lo = draw(st.integers(0, 5))
            return f"a BETWEEN {lo} AND {lo + draw(st.integers(0, 4))}"
        if kind == "like_s":
            pat = draw(st.sampled_from(["x%", "%y", "%z%", "xy_"]))
            return f"s LIKE '{pat}'"
        return "b IS NOT NULL"

    expr = atom()
    for _ in range(draw(st.integers(0, 3))):
        joiner = draw(st.sampled_from(["AND", "OR"]))
        rhs = atom()
        if draw(st.booleans()):
            rhs = f"NOT ({rhs})"
        expr = f"({expr}) {joiner} {rhs}"
    return expr


@settings(max_examples=150, deadline=None)
@given(where_clauses(), st.integers(0, 2**31 - 1))
def test_where_compiler_matches_duckdb(clause, seed):
    """functions.expr.compile_where ≡ DuckDB on the same WHERE string
    over a random table — the OGR-SQL surface's general oracle."""
    import duckdb
    import pyarrow.dataset as pads

    from gdal_ray.functions.expr import compile_where

    rs = np.random.RandomState(seed)
    n = 64
    import pyarrow as pa
    # NULLs (not NaN): DuckDB's total order makes NaN > everything
    # while Arrow follows IEEE — only SQL NULL semantics are shared
    t = pa.table({
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "a": pa.array(rs.randint(0, 10, n)),
        "b": pa.array(rs.uniform(0, 10, n),
                      mask=rs.random_sample(n) < 0.1),
        "s": pa.array(rs.choice(["xyz", "xya", "zzy", "abc", "xy"], n)),
    })
    got = pads.dataset(t).to_table(
        filter=compile_where(clause)).column("rid").to_pylist()
    con = duckdb.connect()
    con.register("t", t)
    want = [r[0] for r in con.execute(
        f"SELECT rid FROM t WHERE {clause} ORDER BY rid").fetchall()]
    assert sorted(got) == want, clause


# --- cells / curves / CRS -------------------------------------------------


def test_hilbert_bijective_small_levels():
    """Every cell at level L gets a distinct Hilbert key (bijectivity)
    and consecutive keys are grid-adjacent (the locality property that
    makes it the spatial-sort/shuffle key)."""
    from gdal_ray.geom import cells as _cells

    L = 4
    n = 1 << L
    # cell-center lon/lat for every (x, y)
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    lon = -180.0 + (xs.ravel() + 0.5) * 360.0 / n
    import math
    yv = ys.ravel()
    lat = np.degrees(np.arctan(np.sinh(
        np.pi * (1.0 - 2.0 * (yv + 0.5) / n))))
    keys = _cells.lonlat_to_hilbert(lon, lat, L)
    assert len(np.unique(keys)) == n * n
    order = np.argsort(keys)
    dx = np.abs(np.diff(xs.ravel()[order]))
    dy = np.abs(np.diff(yv[order]))
    assert ((dx + dy) == 1).all()  # the Hilbert walk is a lattice path


@settings(max_examples=200, deadline=None)
@given(finite_lon, finite_lat)
def test_webmercator_roundtrip(lon, lat):
    from gdal_ray.geom.crs import Transformer

    f = Transformer.from_crs("EPSG:4326", "EPSG:3857")
    i = Transformer.from_crs("EPSG:3857", "EPSG:4326")
    x, y, ok = f.transform_with_errors(np.array([lon]), np.array([lat]))
    lo, la, ok2 = i.transform_with_errors(x, y)
    assert ok.all() and ok2.all()
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_dedup_exact_matches_pandas(seed):
    """dedup_exact's winner rule on random keyed frames == pandas
    sort + drop_duplicates (pure-kernel check of the bucket function,
    no Ray session needed)."""
    import pandas as pd
    import pyarrow as pa

    from gdal_ray.stages.dedup import _BUCKET_COL, _hash_bucket

    rs = np.random.RandomState(seed)
    n = 200
    t = pa.table({
        "k": pa.array(rs.randint(0, 20, n)),
        "ts": pa.array(rs.randint(0, 1000, n)),
        "v": pa.array(rs.random_sample(n)),
    })
    # the bucket function must be deterministic and co-locate keys
    b1 = _hash_bucket(t, ["k"], 16)
    b2 = _hash_bucket(t, ["k"], 16)
    np.testing.assert_array_equal(b1, b2)
    df = t.to_pandas()
    df["bucket"] = b1
    assert (df.groupby("k")["bucket"].nunique() == 1).all()


@st.composite
def select_exprs(draw):
    """Random SELECT-list expressions over integer column a / string
    column s — integer-exact so Arrow and DuckDB agree bit-for-bit."""
    def int_atom():
        kind = draw(st.sampled_from(
            ["col", "lit", "add", "mul", "mod", "abs", "len"]))
        if kind == "col":
            return "a"
        if kind == "lit":
            return str(draw(st.integers(0, 9)))
        if kind == "add":
            return f"(a + {draw(st.integers(0, 9))})"
        if kind == "mul":
            return f"(a * {draw(st.integers(1, 5))})"
        if kind == "mod":
            return f"(a % {draw(st.integers(1, 7))})"
        if kind == "abs":
            return f"ABS(a - {draw(st.integers(0, 9))})"
        return "LENGTH(s)"

    e = int_atom()
    for _ in range(draw(st.integers(0, 2))):
        op = draw(st.sampled_from(["+", "*"]))
        e = f"({e} {op} {int_atom()})"
    # string expression alongside
    sk = draw(st.sampled_from(
        ["UPPER(s)", "LOWER(s)", "SUBSTR(s, 1, 2)",
         "CONCAT(s, '-', CAST(a % 10 AS VARCHAR))"]))
    return f"rid, CAST({e} AS BIGINT) AS v, {sk} AS t"


@settings(max_examples=150, deadline=None)
@given(select_exprs(), st.integers(0, 2**31 - 1))
def test_select_expr_matches_duckdb(sel, seed):
    """compile_select/select_batch ≡ DuckDB on the same SELECT list —
    the swq select-expr evaluator's general oracle (integer-exact
    expressions; the scalar-function registry incl. CAST)."""
    import duckdb
    import pyarrow as pa

    from gdal_ray.functions.expr import select_batch

    rs = np.random.RandomState(seed)
    n = 48
    t = pa.table({
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "a": pa.array(rs.randint(-20, 20, n)),
        "s": pa.array(rs.choice(["xyz", "Abc", "zzy", "q", "xy"], n)),
    })
    got = select_batch(t, sel).to_pandas().sort_values("rid") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(f"SELECT {sel} FROM t ORDER BY rid").fetchdf()
    assert list(got["v"].astype("int64")) == \
        list(want["v"].astype("int64")), sel
    assert list(got["t"]) == list(want["t"]), sel


def test_case_expressions_property(ray_session):
    """CASE (searched + simple + no-ELSE null) vs DuckDB on random
    rows."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    from gdal_ray.functions.expr import select_batch

    rs = np.random.RandomState(9)
    t = pa.table({
        "a": pa.array(rs.randint(-5, 6, 300).astype("int64")),
        "s": pa.array(rs.choice(["x", "y", "z"], 300)),
    })
    sel = ("a, "
           "CASE WHEN a < 0 THEN 'n' WHEN a = 0 THEN 'z' "
           "ELSE 'p' END AS sign, "
           "CASE s WHEN 'x' THEN 10 WHEN 'y' THEN 20 END AS code, "
           "CASE WHEN a > 2 THEN a * 2 ELSE a - 1 END AS v")
    got = select_batch(t, sel).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    ref = con.execute(
        "SELECT a, CASE WHEN a < 0 THEN 'n' WHEN a = 0 THEN 'z' "
        "ELSE 'p' END AS sign, "
        "CASE s WHEN 'x' THEN 10 WHEN 'y' THEN 20 END AS code, "
        "CASE WHEN a > 2 THEN a * 2 ELSE a - 1 END AS v FROM t").df()
    assert (got["sign"] == ref["sign"]).all()
    assert got["code"].fillna(-1).astype(int).tolist() == \
        ref["code"].fillna(-1).astype(int).tolist()
    assert (got["v"] == ref["v"]).all()
