"""gdaldem products — engine kernels vs LITERAL per-pixel
transcriptions of the reference window functions (apps/gdaldem_lib.cpp:
GDALHillshadeAlg / GDALSlopeHornAlg / GDALAspectAlg / TRI / TPI /
roughness / GDALColorReliefGetRGBA) over randomized mosaics, including
cross-seam windows.  The transcriptions are test-only oracles — never
imported by engine code."""

import math
import zlib

import numpy as np

from gdal_ray.stages.dem import (_interp_channel, color_relief,
                                 hillshade, slope_aspect,
                                 terrain_indices)
from gdal_ray.stages.focal import TILE


def _tile_row(z, x, y, grid):
    return {"z": z, "x": x, "y": y, "n_pages": int(grid.sum()),
            "raster": zlib.compress(grid.astype(">u2").tobytes(), 6)}


def _decode_f32(blob):
    return np.frombuffer(zlib.decompress(blob), dtype="<f4") \
        .reshape(TILE, TILE)


def _win9(pad, r, c):
    """afWin of the padded mosaic at padded coords (r, c): rows top to
    bottom, cols left to right (gdaldem_lib.cpp window layout)."""
    return [float(pad[r + k // 3 - 1, c + k % 3 - 1]) for k in range(9)]


# --- literal reference transcriptions (unit north-up geotransform) ---

def _ref_hillshade(w, az=315.0, alt=45.0):
    x = (w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])
    y = -((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2]))
    zf = 1.0 / 8.0
    azr, altr = math.radians(az), math.radians(alt)
    c254 = (254.0 * math.sin(altr)
            - (y * (254.0 * math.cos(azr) * math.cos(altr) * zf)
               - x * (254.0 * math.sin(azr) * math.cos(altr) * zf))) \
        / math.sqrt(1.0 + zf * zf * (x * x + y * y))
    return 1.0 if c254 <= 0 else 1.0 + c254


def _ref_slope_deg(w):
    dx = (w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])
    dy = -((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2]))
    return math.degrees(math.atan(math.sqrt(dx * dx + dy * dy) / 8.0))


def _ref_aspect(w):
    dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
    dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    if dx == 0 and dy == 0:
        return -9999.0
    a = math.degrees(math.atan2(dy, -dx))
    a = 450.0 - a if a > 90.0 else 90.0 - a
    return 0.0 if a == 360.0 else a


def _ref_terrain(w):
    c = w[4]
    others = [w[k] for k in (0, 1, 2, 3, 5, 6, 7, 8)]
    tri_r = math.sqrt(sum((v - c) ** 2 for v in others))
    tri_w = sum(abs(v - c) for v in others) * 0.125
    tpi = c - sum(others) * 0.125
    rough = max(w) - min(w)
    return tri_r, tri_w, tpi, rough


def _mosaic_rows(seed=7, base_x=3, base_y=5, zoom=4):
    rs = np.random.RandomState(seed)
    mosaic = np.zeros((2 * TILE, 2 * TILE), dtype=np.int64)
    pts = rs.randint(0, 2 * TILE, (60, 2))
    mosaic[pts[:, 0], pts[:, 1]] = rs.randint(1, 30, 60)
    # a ridge across the tile seam so cross-tile windows matter
    mosaic[TILE - 2:TILE + 2, TILE - 2:TILE + 2] = 9
    rows = [_tile_row(zoom, base_x + tx, base_y + ty,
                      mosaic[ty * TILE:(ty + 1) * TILE,
                             tx * TILE:(tx + 1) * TILE])
            for tx in range(2) for ty in range(2)]
    return mosaic, rows


def _padded(mosaic):
    pad = np.zeros((mosaic.shape[0] + 2, mosaic.shape[1] + 2),
                   dtype=np.float64)
    pad[1:-1, 1:-1] = mosaic
    return pad


def _sample_coords(rs, mosaic, n=120):
    # random coords + seam-band strides + the 3x3 neighborhood of
    # every nonzero pixel (where the gradients actually live)
    pts = [(int(r), int(c))
           for r, c in rs.randint(0, 2 * TILE, (n, 2))]
    pts += [(TILE - 1, c) for c in range(0, 2 * TILE, 17)]
    pts += [(TILE, c) for c in range(0, 2 * TILE, 17)]
    pts += [(r, TILE - 1) for r in range(0, 2 * TILE, 17)]
    ty, tx = np.nonzero(mosaic)
    for r, c in zip(ty.tolist(), tx.tolist()):
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 2 * TILE and 0 <= cc < 2 * TILE:
                    pts.append((rr, cc))
    return pts


def _collect(ds, cols):
    out = {}
    for _, row in ds.to_pandas().iterrows():
        tx, ty = int(row["x"]) - 3, int(row["y"]) - 5
        out[(tx, ty)] = {c: _decode_f32(row[c]) for c in cols}
    return out


def test_hillshade_matches_reference_transcription(ray_session):
    import ray.data as rd

    mosaic, rows = _mosaic_rows()
    got = _collect(hillshade(rd.from_items(rows)), ["hillshade"])
    assert len(got) == 4
    pad = _padded(mosaic)
    rs = np.random.RandomState(3)
    for r, c in _sample_coords(rs, mosaic):
        w = _win9(pad, r + 1, c + 1)
        exp = _ref_hillshade(w)
        eng = got[(c // TILE, r // TILE)]["hillshade"][r % TILE,
                                                      c % TILE]
        assert abs(eng - exp) < 1e-4, (r, c, eng, exp)


def test_slope_aspect_matches_reference_transcription(ray_session):
    import ray.data as rd

    mosaic, rows = _mosaic_rows(seed=13)
    got = _collect(slope_aspect(rd.from_items(rows)),
                   ["slope_deg", "slope_pct", "aspect"])
    pad = _padded(mosaic)
    rs = np.random.RandomState(5)
    n_nonflat = 0
    for r, c in _sample_coords(rs, mosaic):
        w = _win9(pad, r + 1, c + 1)
        tile = got[(c // TILE, r // TILE)]
        pr, pc = r % TILE, c % TILE
        assert abs(tile["slope_deg"][pr, pc]
                   - _ref_slope_deg(w)) < 1e-4
        exp_a = _ref_aspect(w)
        if exp_a == -9999.0:
            assert tile["aspect"][pr, pc] == -9999.0
        else:
            n_nonflat += 1
            assert abs(tile["aspect"][pr, pc] - exp_a) < 1e-3
    assert n_nonflat > 20  # the sample must exercise real gradients


def test_terrain_indices_match_reference_transcription(ray_session):
    import ray.data as rd

    mosaic, rows = _mosaic_rows(seed=29)
    got = _collect(terrain_indices(rd.from_items(rows)),
                   ["tri_riley", "tri_wilson", "tpi", "roughness"])
    pad = _padded(mosaic)
    rs = np.random.RandomState(17)
    for r, c in _sample_coords(rs, mosaic):
        w = _win9(pad, r + 1, c + 1)
        tr, tw, tp, ro = _ref_terrain(w)
        tile = got[(c // TILE, r // TILE)]
        pr, pc = r % TILE, c % TILE
        assert abs(tile["tri_riley"][pr, pc] - tr) < 1e-3
        assert abs(tile["tri_wilson"][pr, pc] - tw) < 1e-4
        assert abs(tile["tpi"][pr, pc] - tp) < 1e-4
        assert tile["roughness"][pr, pc] == ro


def _ref_color(v, ramp):
    """Literal GDALColorReliefGetRGBA (interpolation mode) for a
    monotone ramp."""
    vals = [e[0] for e in ramp]
    if v <= vals[0]:
        if v == vals[0]:
            return ramp[0][1:]
        return ramp[0][1:]
    if v >= vals[-1]:
        return ramp[-1][1:]
    for i, bv in enumerate(vals):
        if bv == v:
            return ramp[i][1:]
        if bv > v:
            lo, hi = ramp[i - 1], ramp[i]
            ratio = (v - lo[0]) / (hi[0] - lo[0])
            return tuple(
                min(max(int(0.5 + lo[j] + ratio * (hi[j] - lo[j])), 0),
                    255) for j in (1, 2, 3))
    raise AssertionError


def test_color_relief_interpolation(ray_session):
    import ray.data as rd

    ramp = ((0, 10, 20, 60), (1, 40, 90, 120), (4, 120, 200, 140),
            (12, 250, 240, 190), (40, 255, 255, 255))
    grid = np.zeros((TILE, TILE), dtype=np.int64)
    test_vals = [0, 1, 2, 3, 4, 5, 8, 11, 12, 13, 26, 39, 40, 41, 500]
    for i, v in enumerate(test_vals):
        grid[0, i] = v
    out = color_relief(rd.from_items([_tile_row(3, 1, 2, grid)]),
                       ramp).to_pandas()
    assert len(out) == 1
    planes = {ch: np.frombuffer(zlib.decompress(out.iloc[0][ch]),
                                dtype=np.uint8).reshape(TILE, TILE)
              for ch in ("r", "g", "b")}
    for i, v in enumerate(test_vals):
        exp = _ref_color(v, ramp)
        got = (planes["r"][0, i], planes["g"][0, i], planes["b"][0, i])
        assert got == exp, (v, got, exp)


def test_interp_channel_vector_matches_scalar():
    ramp = ((0, 10, 20, 60), (1, 40, 90, 120), (4, 120, 200, 140),
            (12, 250, 240, 190), (40, 255, 255, 255))
    bps = np.array([e[0] for e in ramp], dtype=np.float64)
    ch = np.array([e[1] for e in ramp], dtype=np.float64)
    vals = np.arange(0, 60, dtype=np.float64)
    got = _interp_channel(vals, bps, ch)
    for v, g in zip(vals, got):
        assert int(g) == _ref_color(v, ramp)[0], v


# --- hillshade variants (combined / multidirectional / igor) ---------

def _ref_combined(w, az=315.0, alt=45.0):
    x = (w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])
    y = -((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2]))
    zf = 1.0 / 8.0
    azr, altr = math.radians(az), math.radians(alt)
    slope = (x * x + y * y) * zf * zf
    num = math.sin(altr) - (y * (math.cos(azr) * math.cos(altr) * zf)
                            - x * (math.sin(azr) * math.cos(altr) * zf))
    arg = min(max(num / math.sqrt(1.0 + slope), -1.0), 1.0)
    cang = 1.0 - math.acos(arg) * math.atan(math.sqrt(slope)) \
        / ((math.pi * math.pi) / 4.0)
    return 1.0 if cang <= 0 else 1.0 + 254.0 * cang


def _ref_multidir(w, alt=45.0):
    x = (w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])
    y = -((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2]))
    zf = 1.0 / 8.0
    altr = math.radians(alt)
    xxyy = x * x + y * y
    if xxyy == 0.0:
        return 1.0 + 254.0 * math.sin(altr)
    s127 = 127.0 * math.sin(altr)
    caz = math.cos(altr) * zf
    c225 = 127.0 * math.cos(math.radians(225.0)) * caz
    v225 = max(s127 + (x - y) * c225, 0.0)
    v270 = max(s127 - x * (127.0 * caz), 0.0)
    v315 = max(s127 + (x + y) * c225, 0.0)
    v360 = max(s127 - y * (127.0 * caz), 0.0)
    w225 = 0.5 * xxyy - x * y
    w270, w360 = x * x, y * y
    w315 = xxyy - w225
    return 1.0 + ((w225 * v225 + w270 * v270 + w315 * v315
                   + w360 * v360) / xxyy) \
        / math.sqrt(1.0 + zf * zf * xxyy)


def _ref_igor(w, az=315.0):
    x = (w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])
    y = -((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2]))
    slope_deg = math.degrees(math.atan(math.sqrt(x * x + y * y) / 8.0))
    dxa = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
    dya = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    aspect = math.atan2(dya, -dxa if dxa != 0 else -0.0)
    azr = math.radians(az)
    na1 = aspect + 2 * math.pi if aspect < 0 else aspect
    na2 = math.fmod(1.5 * math.pi - azr, 2 * math.pi)
    na2 = na2 + 2 * math.pi if na2 < 0 else na2
    diff = abs(na1 - na2)
    if diff > math.pi:
        diff = 2 * math.pi - diff
    strength = 1.0 - diff / math.pi
    return 255.0 * (1.0 - (slope_deg / 90.0) * strength)


def test_hillshade_variants_match_reference_transcriptions(ray_session):
    import ray.data as rd

    from gdal_ray.stages.dem import hillshade_variants

    mosaic, rows = _mosaic_rows(seed=41)
    got = _collect(hillshade_variants(rd.from_items(rows)),
                   ["combined", "multidir", "igor"])
    pad = _padded(mosaic)
    rs = np.random.RandomState(23)
    for r, c in _sample_coords(rs, mosaic):
        w = _win9(pad, r + 1, c + 1)
        tile = got[(c // TILE, r // TILE)]
        pr, pc = r % TILE, c % TILE
        assert abs(tile["combined"][pr, pc] - _ref_combined(w)) < 1e-3
        assert abs(tile["multidir"][pr, pc] - _ref_multidir(w)) < 1e-3
        assert abs(tile["igor"][pr, pc] - _ref_igor(w)) < 1e-3


# --- Zevenbergen–Thorne gradient family ------------------------------

def _ref_zt(w, az=315.0, alt=45.0):
    x = w[3] - w[5]
    y = -(w[7] - w[1])
    key = x * x + y * y
    slope = math.degrees(math.atan(math.sqrt(key) * 0.5))
    dxa, dya = w[5] - w[3], w[7] - w[1]
    if dxa == 0 and dya == 0:
        asp = -9999.0
    else:
        a = math.degrees(math.atan2(dya, -dxa if dxa != 0 else -0.0))
        a = 450.0 - a if a > 90.0 else 90.0 - a
        asp = 0.0 if a == 360.0 else a
    zf = 0.5
    azr, altr = math.radians(az), math.radians(alt)
    c254 = (254.0 * math.sin(altr)
            - (y * (254.0 * math.cos(azr) * math.cos(altr) * zf)
               - x * (254.0 * math.sin(azr) * math.cos(altr) * zf))) \
        / math.sqrt(1.0 + zf * zf * key)
    shade = 1.0 if c254 <= 0 else 1.0 + c254
    return slope, asp, shade


def test_zt_matches_reference_transcription(ray_session):
    import ray.data as rd

    from gdal_ray.stages.dem import zt_products

    mosaic, rows = _mosaic_rows(seed=53)
    got = _collect(zt_products(rd.from_items(rows)),
                   ["slope_deg", "aspect", "hillshade"])
    pad = _padded(mosaic)
    rs = np.random.RandomState(31)
    for r, c in _sample_coords(rs, mosaic):
        w = _win9(pad, r + 1, c + 1)
        sl, asp, sh = _ref_zt(w)
        tile = got[(c // TILE, r // TILE)]
        pr, pc_ = r % TILE, c % TILE
        assert abs(tile["slope_deg"][pr, pc_] - sl) < 1e-3
        if asp == -9999.0:
            assert tile["aspect"][pr, pc_] == -9999.0
        else:
            assert abs(tile["aspect"][pr, pc_] - asp) < 1e-3
        assert abs(tile["hillshade"][pr, pc_] - sh) < 1e-3
