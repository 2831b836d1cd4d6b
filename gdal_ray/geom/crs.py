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
# Conic projections — Lambert conformal conic + Albers equal-area
# (2-standard-parallel ellipsoidal forms, Snyder 1987 "Map Projections —
# A Working Manual", USGS PP 1395: LCC eq. 15-1..15-11, Albers eq.
# 14-1..14-21; the same formulas PROJ's lcc/aea use)
# ---------------------------------------------------------------------------

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101


def _snyder_m(phi, e2):
    return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)


def _snyder_t(phi, e):
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))) ** (e / 2.0)


def _snyder_q(phi, e, e2):
    s = np.sin(phi)
    return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                         - (1.0 / (2.0 * e))
                         * np.log((1.0 - e * s) / (1.0 + e * s)))


class _LCC:
    """Lambert conformal conic 2SP (Snyder 15-1..15-11)."""

    def __init__(self, lat1, lat2, lat0, lon0, x0=0.0, y0=0.0,
                 a=GRS80_A, f=GRS80_F):
        e2 = f * (2.0 - f)
        self.a, self.e, self.e2 = a, np.sqrt(e2), e2
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
        m1, m2 = _snyder_m(p1, e2), _snyder_m(p2, e2)
        t1, t2 = _snyder_t(p1, self.e), _snyder_t(p2, self.e)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)) \
            if lat1 != lat2 else np.sin(p1)
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = a * self.F * _snyder_t(p0, self.e) ** self.n
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def forward(self, lon, lat):
        phi = np.radians(lat)
        t = _snyder_t(phi, self.e)
        rho = self.a * self.F * t ** self.n
        th = self.n * np.radians(
            ((lon - self.lon0 + 180.0) % 360.0) - 180.0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        xr = np.asarray(x, dtype=np.float64) - self.x0
        yr = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sign(self.n) * np.hypot(xr, yr)
        th = np.arctan2(np.sign(self.n) * xr, np.sign(self.n) * yr)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        # iterate Snyder 7-9: phi from t
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0))
        return (self.lon0 + np.degrees(th / self.n), np.degrees(phi))


class _Albers:
    """Albers equal-area conic 2SP (Snyder 14-1..14-21)."""

    def __init__(self, lat1, lat2, lat0, lon0, x0=0.0, y0=0.0,
                 a=GRS80_A, f=GRS80_F):
        e2 = f * (2.0 - f)
        self.a, self.e, self.e2 = a, np.sqrt(e2), e2
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
        m1, m2 = _snyder_m(p1, e2), _snyder_m(p2, e2)
        q1 = _snyder_q(p1, self.e, e2)
        q2 = _snyder_q(p2, self.e, e2)
        q0 = _snyder_q(p0, self.e, e2)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1) if lat1 != lat2 \
            else np.sin(p1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def forward(self, lon, lat):
        q = _snyder_q(np.radians(lat), self.e, self.e2)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * np.radians(
            ((lon - self.lon0 + 180.0) % 360.0) - 180.0)
        return (self.x0 + rho * np.sin(th),
                self.y0 + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        xr = np.asarray(x, dtype=np.float64) - self.x0
        yr = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.hypot(xr, yr)
        th = np.arctan2(xr, yr)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        # iterate Snyder 3-16: phi from q
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(8):
            s = np.sin(phi)
            es = self.e * s
            phi = phi + (1.0 - self.e2 * s * s) ** 2 / (
                2.0 * np.cos(phi)) * (
                q / (1.0 - self.e2)
                - s / (1.0 - self.e2 * s * s)
                + 1.0 / (2.0 * self.e)
                * np.log((1.0 - es) / (1.0 + es)))
        return (self.lon0 + np.degrees(th / self.n), np.degrees(phi))


class _PolarStereo:
    """Polar stereographic, variant B (standard parallel; Snyder
    21-33..21-41, ellipsoidal).  ``south=True`` mirrors the aspect: the
    math runs on (−lat, λ−λ0 negated in y) per Snyder p.161, which is
    what PROJ's +proj=stere +lat_0=−90 does."""

    def __init__(self, lat_ts, lon0, x0=0.0, y0=0.0, south=False,
                 a=WGS84_A, f=WGS84_F):
        e2 = f * (2.0 - f)
        self.a, self.e, self.e2 = a, np.sqrt(e2), e2
        self.south = south
        pc = np.radians(abs(lat_ts))
        self.mc = _snyder_m(pc, e2)
        self.tc = _snyder_t(pc, self.e)
        self.k = a * self.mc / self.tc  # rho = k * t(phi)
        self.lon0, self.x0, self.y0 = lon0, x0, y0

    def forward(self, lon, lat):
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(-lat if self.south else lat)
        t = _snyder_t(phi, self.e)
        rho = self.k * t
        lam = np.radians(((lon - self.lon0 + 180.0) % 360.0) - 180.0)
        if self.south:
            lam = -lam
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if self.south:
            x, y = -x, -y
        return self.x0 + x, self.y0 + y

    def inverse(self, x, y):
        xr = np.asarray(x, dtype=np.float64) - self.x0
        yr = np.asarray(y, dtype=np.float64) - self.y0
        if self.south:
            xr, yr = -xr, -yr
        rho = np.hypot(xr, yr)
        t = rho / self.k
        # iterate Snyder 7-9 (same fixed point as the conics)
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0))
        lam = np.arctan2(xr, -yr)
        if self.south:
            lam = -lam
        lat = np.degrees(phi)
        return (self.lon0 + np.degrees(lam),
                -lat if self.south else lat)


# ---------------------------------------------------------------------------
# CRS registry + Transformer
# ---------------------------------------------------------------------------


def _parse_crs(crs) -> tuple[str, dict]:
    """Accept 'EPSG:4326' / 4326 / 'epsg:32631' → kind + params, or a
    dict spec {'proj': 'lcc'|'aea', 'lat_1':..., 'lat_2':..., 'lat_0':
    ..., 'lon_0':..., 'x_0':..., 'y_0':...} for arbitrary conic CRS
    (ellipsoid defaults to GRS80; pass a/f to override)."""
    if isinstance(crs, dict):
        proj = crs.get("proj")
        if proj == "stere":
            # polar aspects only (lat_0 = ±90), PROJ-style keys
            lat0 = float(crs.get("lat_0", 90.0))
            if abs(lat0) != 90.0:
                raise ValueError("stere: polar aspects only (lat_0=±90)")
            conic = _PolarStereo(crs.get("lat_ts", lat0),
                                 crs.get("lon_0", 0.0),
                                 crs.get("x_0", 0.0), crs.get("y_0", 0.0),
                                 south=lat0 < 0,
                                 a=crs.get("a", WGS84_A),
                                 f=crs.get("f", WGS84_F))
            return "conic", {"conic": conic}
        if proj not in ("lcc", "aea"):
            raise ValueError(f"unsupported dict CRS proj={proj!r}")
        cls = _LCC if proj == "lcc" else _Albers
        conic = cls(crs["lat_1"], crs["lat_2"], crs.get("lat_0", 0.0),
                    crs.get("lon_0", 0.0), crs.get("x_0", 0.0),
                    crs.get("y_0", 0.0), crs.get("a", GRS80_A),
                    crs.get("f", GRS80_F))
        return "conic", {"conic": conic}
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
    if code == 5070:  # NAD83 / Conus Albers (GRS80)
        return "conic", {"conic": _Albers(29.5, 45.5, 23.0, -96.0)}
    if code == 3978:  # NAD83 / Canada Lambert conformal conic (GRS80)
        return "conic", {"conic": _LCC(49.0, 77.0, 49.0, -95.0)}
    if code == 3413:  # WGS84 / NSIDC Sea Ice Polar Stereographic North
        return "conic", {"conic": _PolarStereo(70.0, -45.0)}
    if code == 3031:  # WGS84 / Antarctic Polar Stereographic
        return "conic", {"conic": _PolarStereo(-71.0, 0.0, south=True)}
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
    if kind == "conic":
        ok = np.isfinite(x) & np.isfinite(y)
        lon, lat = p["conic"].inverse(x, y)
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
    if kind == "conic":
        # |lat| == 90 is on the cone axis (LCC: t→0 or ∞) — still
        # finite for the supported parameter ranges; flag only NaNs
        ok = (np.abs(lat) <= 90.0) & np.isfinite(lon)
        lat_c = np.where(ok, lat, 0.0)
        X, Y = p["conic"].forward(np.where(ok, lon, 0.0), lat_c)
        return np.where(ok, X, np.nan), np.where(ok, Y, np.nan), ok
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
