"""Coordinate reprojection — pure-numpy PROJ-semantics transformer.

Mirrors the subset of ``OGRCoordinateTransformation`` semantics the
engine needs (factory ogr/ogrct.cpp:1027,1100; array API
``TransformWithErrorCodes(n, x[], y[], ...)`` ogr/ogrct.cpp:2359; axis
order ``OAMS_TRADITIONAL_GIS_ORDER`` = always x=lon, y=lat,
ogr/ogr_spatialref.h:291) with a pyproj-compatible surface:

    t = Transformer.from_crs("EPSG:4326", "EPSG:3857", always_xy=True)
    x2, y2 = t.transform(x, y)
    x2, y2, ok = t.transform_with_errors(x, y)

Supported CRS (all math public):
- EPSG:4326  — WGS84 geographic degrees
- EPSG:3857  — spherical Web Mercator (a=6378137)
- EPSG:326NN / 327NN — WGS84 UTM north/south: transverse Mercator via
  the Krüger/Karney series (6th order in the third flattening n; the
  same series PROJ's ``etmerc``/GeographicLib use — accuracy a few nm),
  k0=0.9996, FE=500000, FN=0 (north) / 10000000 (south).

Out-of-domain inputs (e.g. |lat|>90, web-mercator pole) yield success
flag False and NaN coordinates, matching TransformWithErrorCodes'
per-point error reporting rather than raising.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = np.sqrt(WGS84_E2)
_N = WGS84_F / (2.0 - WGS84_F)  # third flattening

WEBMERC_R = 6378137.0
WEBMERC_MAX_LAT = 85.05112877980659

# --- Krüger series coefficients, 6th order in n (Karney 2011, eqs 35-36;
# identical to GeographicLib TransverseMercator / PROJ etmerc) -------------


def _kruger_coeffs(n: float):
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    alpha = np.array(
        [
            n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
            + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
            - 1983433 * n6 / 1935360,
            61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
            + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ]
    )
    beta = np.array(
        [
            n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
            + 96199 * n6 / 604800,
            n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
            - 1118711 * n6 / 3870720,
            17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ]
    )
    # rectifying-radius factor A/a
    a_factor = (1 + n2 / 4 + n4 / 64 + n6 / 256) / (1 + n)
    return alpha, beta, a_factor


_ALPHA, _BETA, _AFACT = _kruger_coeffs(_N)
_A_RECT = WGS84_A * _AFACT  # Karney's A (rectifying radius * scale)
_J = np.arange(1, 7, dtype=np.float64)


def _tau_prime(tau: np.ndarray) -> np.ndarray:
    """Exact conformal tangent tau' from geographic tangent tau
    (Karney 2011 eq. 7-9)."""
    sigma = np.sinh(WGS84_E * np.arctanh(WGS84_E * tau / np.hypot(1.0, tau)))
    return tau * np.hypot(1.0, sigma) - sigma * np.hypot(1.0, tau)


def _tau_from_tau_prime(taup: np.ndarray) -> np.ndarray:
    """Invert tau'(tau) by Newton iteration (Karney 2011 eq. 19-21);
    converges to machine precision in <=5 iterations."""
    e2m = 1.0 - WGS84_E2
    tau = taup / e2m  # first guess
    for _ in range(6):
        taup_i = _tau_prime(tau)
        dtau = (taup - taup_i) * (1.0 + e2m * tau**2) / (
            e2m * np.hypot(1.0, tau) * np.hypot(1.0, taup_i)
        )
        tau = tau + dtau
    return tau


def tm_forward(lon_deg, lat_deg, lon0_deg: float, k0: float, fe: float, fn: float):
    """Transverse Mercator forward (Krüger series): degrees → (E, N)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlon = np.radians(
        ((np.asarray(lon_deg, dtype=np.float64) - lon0_deg + 180.0) % 360.0) - 180.0
    )
    taup = _tau_prime(np.tan(lat))
    xi_p = np.arctan2(taup, np.cos(dlon))
    eta_p = np.arcsinh(np.sin(dlon) / np.hypot(taup, np.cos(dlon)))
    j2xi = 2.0 * np.multiply.outer(_J, xi_p)
    j2eta = 2.0 * np.multiply.outer(_J, eta_p)
    a = _ALPHA.reshape((6,) + (1,) * xi_p.ndim)
    xi = xi_p + np.sum(a * np.sin(j2xi) * np.cosh(j2eta), axis=0)
    eta = eta_p + np.sum(a * np.cos(j2xi) * np.sinh(j2eta), axis=0)
    return fe + k0 * _A_RECT * eta, fn + k0 * _A_RECT * xi


def tm_inverse(E, N, lon0_deg: float, k0: float, fe: float, fn: float):
    """Transverse Mercator inverse: (E, N) → degrees."""
    eta = (np.asarray(E, dtype=np.float64) - fe) / (k0 * _A_RECT)
    xi = (np.asarray(N, dtype=np.float64) - fn) / (k0 * _A_RECT)
    j2xi = 2.0 * np.multiply.outer(_J, xi)
    j2eta = 2.0 * np.multiply.outer(_J, eta)
    b = _BETA.reshape((6,) + (1,) * np.ndim(xi))
    xi_p = xi - np.sum(b * np.sin(j2xi) * np.cosh(j2eta), axis=0)
    eta_p = eta - np.sum(b * np.cos(j2xi) * np.sinh(j2eta), axis=0)
    taup = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    lat = np.degrees(np.arctan(_tau_from_tau_prime(taup)))
    lon = lon0_deg + np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
    return lon, lat


# ---------------------------------------------------------------------------
# CRS registry + Transformer
# ---------------------------------------------------------------------------


def _parse_crs(crs) -> tuple[str, dict]:
    """Accept 'EPSG:4326' / 4326 / 'epsg:32631' → kind + params."""
    if isinstance(crs, int):
        code = crs
    else:
        s = str(crs).strip().upper()
        if not s.startswith("EPSG:"):
            raise ValueError(f"unsupported CRS {crs!r} (EPSG:* only)")
        code = int(s.split(":", 1)[1])
    if code == 4326:
        return "geographic", {}
    if code == 3857:
        return "webmercator", {}
    if 32601 <= code <= 32660:
        return "utm", {"lon0": (code - 32600) * 6 - 183, "fn": 0.0}
    if 32701 <= code <= 32760:
        return "utm", {"lon0": (code - 32700) * 6 - 183, "fn": 10000000.0}
    raise ValueError(f"unsupported CRS EPSG:{code}")


def _to_geographic(kind: str, p: dict, x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if kind == "geographic":
        ok = (np.abs(y) <= 90.0) & np.isfinite(x) & np.isfinite(y)
        return np.where(ok, x, np.nan), np.where(ok, y, np.nan), ok
    if kind == "webmercator":
        ok = np.isfinite(x) & np.isfinite(y)
        lon = x / WEBMERC_R
        lat = 2.0 * np.arctan(np.exp(y / WEBMERC_R)) - np.pi / 2.0
        return (
            np.where(ok, np.degrees(lon), np.nan),
            np.where(ok, np.degrees(lat), np.nan),
            ok,
        )
    if kind == "utm":
        ok = np.isfinite(x) & np.isfinite(y)
        lon, lat = tm_inverse(x, y, p["lon0"], 0.9996, 500000.0, p["fn"])
        return np.where(ok, lon, np.nan), np.where(ok, lat, np.nan), ok
    raise AssertionError(kind)


def _from_geographic(kind: str, p: dict, lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if kind == "geographic":
        ok = (np.abs(lat) <= 90.0) & np.isfinite(lon)
        return np.where(ok, lon, np.nan), np.where(ok, lat, np.nan), ok
    if kind == "webmercator":
        # PROJ errors outside the mercator domain (|lat| >= 90); beyond
        # the square's edge (85.051...) values are finite but huge —
        # match web-mercator's own domain by flagging |lat| > 90 only.
        ok = (np.abs(lat) < 90.0) & np.isfinite(lon)
        lat_c = np.where(ok, lat, 0.0)
        # identical op order + constants to tiles.lonlat_to_meters
        x = lon * 20037508.342789244 / 180.0
        yv = np.log(np.tan((90.0 + lat_c) * np.pi / 360.0)) * WEBMERC_R
        return np.where(ok, x, np.nan), np.where(ok, yv, np.nan), ok
    if kind == "utm":
        ok = (np.abs(lat) <= 90.0) & np.isfinite(lon)
        lat_c = np.where(ok, lat, 0.0)
        lon_c = np.where(ok, lon, p["lon0"])
        E, Nn = tm_forward(lon_c, lat_c, p["lon0"], 0.9996, 500000.0, p["fn"])
        return np.where(ok, E, np.nan), np.where(ok, Nn, np.nan), ok
    raise AssertionError(kind)


class Transformer:
    """pyproj-compatible subset; ``always_xy=True`` is the only supported
    axis strategy (OAMS_TRADITIONAL_GIS_ORDER, ogr/ogr_spatialref.h:291)."""

    def __init__(self, src_kind, src_p, dst_kind, dst_p):
        self._src = (src_kind, src_p)
        self._dst = (dst_kind, dst_p)

    @classmethod
    def from_crs(cls, src, dst, always_xy: bool = True) -> "Transformer":
        if not always_xy:
            raise ValueError("only always_xy=True (traditional GIS order) supported")
        return cls(*_parse_crs(src), *_parse_crs(dst))

    def transform_with_errors(self, x, y):
        """Array-in / array-out with per-point success flags — the
        TransformWithErrorCodes contract (ogr/ogrct.cpp:2359)."""
        lon, lat, ok1 = _to_geographic(*self._src, x, y)
        X, Y, ok2 = _from_geographic(*self._dst, lon, lat)
        ok = ok1 & ok2
        return np.where(ok, X, np.nan), np.where(ok, Y, np.nan), ok

    def transform(self, x, y):
        X, Y, _ = self.transform_with_errors(x, y)
        return X, Y
