"""WebMercatorQuad tile math — vectorized GlobalMercator.

Re-derives, in numpy, the exact tile-matrix math of the reference's
tiling path (`gdal raster tile` / gdal2tiles `GlobalMercator`,
swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:316-504 and
apps/gdalalg_raster_tile.cpp:206-212):

- sphere radius R = 6378137 m (WebMercatorQuad / GoogleMapsCompatible)
- origin shift = pi * R = 20037508.342789244 m  (gdal2tiles.py:420)
- tile size = 256 px; Resolution(z) = 2*pi*R/256 / 2**z  (gdal2tiles.py:498-503)
- XYZ vs TMS row flip: y_xyz = 2**z - 1 - y_tms
  (gdal2tiles.py:512-517 `GoogleTile`; gdalalg_raster_tile.cpp:510-512 `GetFileY`)

All functions accept scalars or numpy arrays and return numpy arrays.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = 20037508.342789244  # pi * EARTH_RADIUS
TILE_SIZE = 256
INITIAL_RESOLUTION = 2 * ORIGIN_SHIFT / TILE_SIZE  # 156543.03392804097
# max latitude representable in Web Mercator (where |y| == ORIGIN_SHIFT)
MAX_LATITUDE = 85.05112877980659


def lonlat_to_meters(lon, lat):
    """EPSG:4326 → EPSG:3857 (spherical web-mercator forward).
    Matches GlobalMercator.LatLonToMeters (gdal2tiles.py:424-431)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) * EARTH_RADIUS
    return mx, my


def meters_to_lonlat(mx, my):
    """EPSG:3857 → EPSG:4326 inverse."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = mx / ORIGIN_SHIFT * 180.0
    lat = np.degrees(2 * np.arctan(np.exp(my / EARTH_RADIUS)) - np.pi / 2)
    return lon, lat


def resolution(z) -> np.ndarray:
    """meters/pixel at zoom z (gdal2tiles.py:498-503)."""
    return INITIAL_RESOLUTION / (2 ** np.asarray(z, dtype=np.float64))


def meters_to_tile(mx, my, z):
    """EPSG:3857 meters → TMS tile indices at zoom z
    (MetersToPixels + PixelsToTile, gdal2tiles.py:434-479).
    TMS convention: ty=0 is the SOUTH row."""
    res = resolution(z)
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / res
    py = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / res
    n = np.int64(1) << np.asarray(z, dtype=np.int64)
    tx = np.clip(np.ceil(px / float(TILE_SIZE)).astype(np.int64) - 1, 0, n - 1)
    ty = np.clip(np.ceil(py / float(TILE_SIZE)).astype(np.int64) - 1, 0, n - 1)
    return tx, ty


def tms_to_xyz(ty, z):
    """TMS row → XYZ (Google/slippy) row: y = 2**z - 1 - ty
    (gdal2tiles.py:512-517, gdalalg_raster_tile.cpp:510-512)."""
    n = np.int64(1) << np.asarray(z, dtype=np.int64)
    return n - 1 - np.asarray(ty, dtype=np.int64)


xyz_to_tms = tms_to_xyz  # the flip is an involution


def lonlat_to_tile(lon, lat, z, convention: str = "xyz"):
    """lon/lat degrees → integer tile (tx, ty) at zoom z.

    Uses the direct slippy-map formula
        x     = floor((lon+180)/360 * 2^z)
        y_xyz = floor((1 - ln(tan φ + sec φ)/π)/2 * 2^z)
    which is algebraically identical to GlobalMercator's
    meters→pixels→tile chain (gdal2tiles.py:434-479) away from exact tile
    boundaries; the direct form is kept operation-for-operation identical
    to the SQL oracle so boundary-exact inputs agree bit-for-bit.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LATITUDE, MAX_LATITUDE)
    n = np.int64(1) << np.int64(z)
    tx = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    r = np.radians(lat)
    y_frac = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0
    ty = np.clip(np.floor(y_frac * n).astype(np.int64), 0, n - 1)  # xyz rows
    if convention == "tms":
        ty = tms_to_xyz(ty, z)  # involution: xyz→tms
    elif convention != "xyz":
        raise ValueError(f"convention must be xyz|tms, got {convention}")
    return tx, ty


def lonlat_to_tile_geodetic(lon, lat, z, convention: str = "xyz"):
    """Geodetic (plate-carrée / WorldCRS84Quad) tile profile: at zoom z
    the world is 2^(z+1) × 2^z tiles of 180/2^z degrees each
    (gdal2tiles.py GlobalGeodetic; the ``geodetic`` tiling profile of
    apps/gdalalg_raster_tile.cpp:206-212).  xyz rows run north→south
    from lat +90; tms flips.  No latitude cutoff — the whole ±90 range
    tiles, unlike web mercator."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.int64(1) << np.int64(z)
    tx = np.clip(np.floor((lon + 180.0) / 180.0 * n).astype(np.int64),
                 0, 2 * n - 1)
    ty = np.clip(np.floor((90.0 - lat) / 180.0 * n).astype(np.int64),
                 0, n - 1)
    if convention == "tms":
        ty = n - 1 - ty
    elif convention != "xyz":
        raise ValueError(f"convention must be xyz|tms, got {convention}")
    return tx, ty


def tile_bounds_meters(tx, ty, z):
    """Bounds of a TMS tile in EPSG:3857 meters (gdal2tiles.py:480-488)."""
    res = resolution(z)
    minx = np.asarray(tx, dtype=np.float64) * TILE_SIZE * res - ORIGIN_SHIFT
    miny = np.asarray(ty, dtype=np.float64) * TILE_SIZE * res - ORIGIN_SHIFT
    return minx, miny, minx + TILE_SIZE * res, miny + TILE_SIZE * res


def global_pixel(lon, lat, z):
    """Global pixel coordinates (gx, gy) at zoom z, XYZ orientation
    (gy = 0 at the NORTH edge), via the direct slippy formula:
        gx = floor((lon+180)/360 * 256*2^z)
        gy = floor((1 - ln(tan φ + sec φ)/π)/2 * 256*2^z)
    operation-for-operation identical to `lonlat_to_tile` and the SQL
    oracles, so boundary-exact longitudes (e.g. -90, 0, 45) land on the
    same pixel in both; the meters→pixels chain differs by 1 ulp there."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LATITUDE, MAX_LATITUDE)
    npix = np.int64(TILE_SIZE) << np.int64(z)
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * npix).astype(np.int64), 0, npix - 1)
    r = np.radians(lat)
    y_frac = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0
    gy = np.clip(np.floor(y_frac * npix).astype(np.int64), 0, npix - 1)
    return gx, gy


def tile_pixel(lon, lat, z, convention: str = "xyz"):
    """(tile x, tile y, pixel col 0..255, pixel row 0..255) for each point.
    Pixel row follows the convention: xyz → row 0 at tile's NORTH edge
    (raster order, as a PNG tile is written).

    Derived from `global_pixel` (tx = gx>>8, col = gx&255) so it agrees
    bit-for-bit with `lonlat_to_tile` on boundary-exact coordinates."""
    gx, gy = global_pixel(lon, lat, z)
    tx = gx >> 8
    col = gx & (TILE_SIZE - 1)
    ty_xyz = gy >> 8
    row_xyz = gy & (TILE_SIZE - 1)
    if convention == "xyz":
        return tx, ty_xyz, col, row_xyz
    if convention == "tms":
        return tx, tms_to_xyz(ty_xyz, z), col, TILE_SIZE - 1 - row_xyz
    raise ValueError(f"convention must be xyz|tms, got {convention}")


def global_pixel_geodetic(lon, lat, z):
    """Global pixel coordinates on the geodetic (plate-carrée) grid at
    zoom z: 2^(z+1)·256 columns × 2^z·256 rows, row 0 at lat +90
    (GlobalGeodetic resolution 180/256/2^z)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.int64(1) << np.int64(z)
    w = 2 * n * TILE_SIZE
    h = n * TILE_SIZE
    gx = np.clip(np.floor((lon + 180.0) / 180.0 * (n * TILE_SIZE))
                 .astype(np.int64), 0, w - 1)
    gy = np.clip(np.floor((90.0 - lat) / 180.0 * (n * TILE_SIZE))
                 .astype(np.int64), 0, h - 1)
    return gx, gy


def tile_pixel_geodetic(lon, lat, z, convention: str = "xyz"):
    """Geodetic-profile (tile x, tile y, col, row); derived from
    `global_pixel_geodetic` so it agrees bit-for-bit with
    `lonlat_to_tile_geodetic`."""
    gx, gy = global_pixel_geodetic(lon, lat, z)
    n = np.int64(1) << np.int64(z)
    tx = gx >> 8
    col = gx & (TILE_SIZE - 1)
    ty_xyz = gy >> 8
    row_xyz = gy & (TILE_SIZE - 1)
    if convention == "xyz":
        return tx, ty_xyz, col, row_xyz
    if convention == "tms":
        return tx, n - 1 - ty_xyz, col, TILE_SIZE - 1 - row_xyz
    raise ValueError(f"convention must be xyz|tms, got {convention}")


def parent_tile(tx, ty, z):
    """(z-1)-level parent of an XYZ tile: (x//2, y//2) — the child-gathering
    rule of overview generation (gdalalg_raster_tile.cpp:6062-6089)."""
    return np.asarray(tx, dtype=np.int64) >> 1, np.asarray(ty, dtype=np.int64) >> 1
