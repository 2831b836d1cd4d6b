"""gdal_viewshed — engine sweep vs a LITERAL transcription of the
reference executor's line loops (alg/viewshed/viewshed_executor.cpp:
processFirstLine left/right + processLine with the center-column
CalcHeightLine and the doEdge/doDiagonal/doMin/doMax cell dispatch),
plus shadow goldens and the cross-tile exchange.  The transcription is
test-only — never imported by engine code."""

import zlib

import numpy as np

from gdal_ray.stages.viewshed import TILE, viewshed, viewshed_window


def _calc_height_line(n, za):
    return za * n / (n - 1)


def _calc_height_edge(i, j, za, zb):
    return (za * i + zb * (j - i)) / (j - 1)


def _calc_height_diagonal(i, j, za, zb):
    return (za * i + zb * j) / (i + j - 1)


def _do_cell(mode, nx, ny, this_prev, last, last_prev):
    edge = (_calc_height_edge(ny, nx, last_prev, this_prev)
            if nx >= ny else _calc_height_edge(nx, ny, last_prev, last))
    diag = _calc_height_diagonal(nx, ny, this_prev, last)
    if mode == "edge":
        return edge
    if mode == "diagonal":
        return diag
    return min(edge, diag) if mode == "min" else max(edge, diag)


def _ref_viewshed(dem, ox, oy, max_dist, oz, th, mode):
    """Literal line-sweep transcription: observer at (ox, oy), result
    255/0, out-of-range 0."""
    H, W = dem.shape
    z_obs = dem[oy, ox] + oz
    result = np.zeros((H, W), dtype=np.uint8)
    max2 = max_dist * max_dist

    def in_range(x, y):
        return (x - ox) ** 2 + (y - oy) ** 2 <= max2

    def sweep_half(direction):
        # direction +1: lines below observer; -1: above
        cur = dem[oy].astype(float) - z_obs
        # first line
        result[oy, ox] = 255
        for step, px in ((1, ox + 1), (-1, ox - 1)):
            x = px
            prev_val = None
            while 0 <= x < W:
                nxo = abs(x - ox)
                if nxo == 1:
                    dfz = cur[x]
                else:
                    dfz = _calc_height_line(nxo, prev_val)
                if in_range(x, oy):
                    result[oy, x] = 255 if cur[x] + th >= dfz else 0
                cur[x] = max(cur[x], dfz)
                prev_val = cur[x]
                x += step
        prev = cur.copy()
        y = oy + direction
        while 0 <= y < H and abs(y - oy) <= max_dist:
            cur = dem[y].astype(float) - z_obs
            nyo = abs(y - oy)
            # center column
            dfz = cur[ox] if nyo == 1 else _calc_height_line(nyo,
                                                             prev[ox])
            if in_range(ox, y):
                result[y, ox] = 255 if cur[ox] + th >= dfz else 0
            cur[ox] = max(cur[ox], dfz)
            # left then right
            for step in (-1, 1):
                x = ox + step
                while 0 <= x < W:
                    nxo = abs(x - ox)
                    if nxo == nyo:
                        dfz = cur[x] if nyo == 1 else \
                            _calc_height_line(nyo, prev[x - step])
                    else:
                        dfz = _do_cell(mode, nxo, nyo, cur[x - step],
                                       prev[x], prev[x - step])
                    if in_range(x, y):
                        result[y, x] = 255 if cur[x] + th >= dfz else 0
                    cur[x] = max(cur[x], dfz)
                    x += step
            prev = cur
            y += direction

    sweep_half(1)
    sweep_half(-1)
    result[oy, ox] = 255
    return result


def _window_from(dem, ox, oy, R):
    n = 2 * R + 1
    w = np.zeros((n, n), dtype=np.int64)
    H, W = dem.shape
    y0, y1 = max(0, oy - R), min(H, oy + R + 1)
    x0, x1 = max(0, ox - R), min(W, ox + R + 1)
    w[y0 - (oy - R):y1 - (oy - R), x0 - (ox - R):x1 - (ox - R)] = \
        dem[y0:y1, x0:x1]
    return w


def test_viewshed_matches_reference_transcription_all_modes():
    rs = np.random.RandomState(7)
    R = 12
    dem = np.zeros((64, 64), dtype=np.int64)
    pts = rs.randint(8, 56, (40, 2))
    dem[pts[:, 0], pts[:, 1]] = rs.randint(1, 12, 40)
    ox, oy = 30, 33
    for mode in ("edge", "diagonal", "min", "max"):
        ref = _ref_viewshed(dem, ox, oy, R, 2.0, 0.0, mode)
        got = viewshed_window(_window_from(dem, ox, oy, R), R, 2.0,
                              0.0, mode)
        # compare over the in-range disc
        dy, dx = np.mgrid[-R:R + 1, -R:R + 1]
        inr = dx * dx + dy * dy <= R * R
        sub = ref[oy - R:oy + R + 1, ox - R:ox + R + 1]
        assert np.array_equal(got[inr], sub[inr]), mode


def test_viewshed_wall_shadow():
    R = 10
    n = 2 * R + 1
    w = np.zeros((n, n), dtype=np.int64)
    w[R, R + 3] = 50                      # a wall 3 px east
    vis = viewshed_window(w, R, 2.0, 0.0, "edge")
    assert vis[R, R + 3] == 255           # the wall top is visible
    assert vis[R, R + 4] == 0             # behind it: shadow
    assert vis[R, R + 8] == 0
    assert vis[R, R - 4] == 255           # other directions clear
    assert vis[R - 4, R] == 255


def test_viewshed_flat_all_visible():
    R = 8
    vis = viewshed_window(np.zeros((17, 17), np.int64), R, 2.0, 0.0,
                          "edge")
    dy, dx = np.mgrid[-R:R + 1, -R:R + 1]
    inr = dx * dx + dy * dy <= R * R
    assert (vis[inr] == 255).all()


def test_viewshed_cross_tile_exchange(ray_session):
    import ray.data as rd

    rs = np.random.RandomState(3)
    mosaic = np.zeros((2 * TILE, 2 * TILE), dtype=np.int64)
    pts = rs.randint(0, 2 * TILE, (60, 2))
    mosaic[pts[:, 0], pts[:, 1]] = rs.randint(1, 20, 60)
    rows = []
    for tx in range(2):
        for ty in range(2):
            sub = mosaic[ty * TILE:(ty + 1) * TILE,
                         tx * TILE:(tx + 1) * TILE]
            rows.append({"z": 4, "x": tx, "y": ty, "n_pages": 1,
                         "raster": zlib.compress(
                             sub.astype(">u2").tobytes(), 6)})
    R = 20
    # observer near the four-corner seam: the window spans all tiles
    obs = [(0, TILE - 3, TILE + 2), (1, 5, 5)]
    out = viewshed(rd.from_items(rows), obs, R).to_pandas()
    assert len(out) == 2
    for _, row in out.iterrows():
        ogx, ogy = int(row["gx"]), int(row["gy"])
        got = np.frombuffer(zlib.decompress(row["visible"]),
                            dtype=np.uint8).reshape(2 * R + 1,
                                                    2 * R + 1)
        exp = viewshed_window(_window_from(mosaic, ogx, ogy, R), R,
                              2.0, 0.0, "edge")
        assert np.array_equal(got, exp)


def test_viewshed_registry_step(ray_session):
    import ray.data as rd
    from gdal_ray.pipelines.registry import REGISTRY

    grid = np.zeros((TILE, TILE), np.int64)
    grid[40, 40] = 9
    tds = rd.from_items([{"z": 3, "x": 0, "y": 0, "n_pages": 1,
                          "raster": zlib.compress(
                              grid.astype(">u2").tobytes(), 6)}])
    out = REGISTRY["viewshed"](
        tds, {"observers": [[0, 40, 40]], "max_dist": 8}).to_pandas()
    assert len(out) == 1 and int(out["obs_id"][0]) == 0
