"""Pure-numpy coordinate transforms (no pyproj in the runtime image).

Parity surface: ``coord_transform(x, y, from_epsg, to_epsg)``
(reference neilpy/neilpy.py:108-110) and the geodesic helpers used by
the photogrammetry stack (track2azimuth via pyproj.Geod at
neilpy.py:2425-2440; great_circle_distance at neilpy.py:888-898).

Implemented CRS families:

* EPSG:4326  WGS84 geographic (lon/lat degrees)
* EPSG:326xx / 327xx  WGS84 UTM north/south zones (transverse
  Mercator, Kruger 6th-order series — sub-mm vs pyproj inside zones)
* EPSG:3857  Web/spherical Mercator
* any projected EPSG code whose conversion is Transverse Mercator
  (9807), Lambert Conformal Conic 2SP (9802) or 1SP (9801) on a
  GRS80/WGS84-class ellipsoid — parameters are read from the system
  PROJ database (``/usr/share/proj/proj.db``) when present, which
  covers the NAD83 US State Plane zones (EPSG 26929-26998,
  32100-32158 and their ftUS twins 22xx) that dominate US lidar
  practice.  Axis units (metre / ftUS / ft) are honoured.  Codes on
  non-GRS80-class datums (e.g. NAD27 / Clarke 1866) are rejected with
  a clear error: a correct transform there needs datum-shift grids.

Geodesics on the WGS84 ellipsoid use Vincenty's inverse formula with a
spherical fallback at antipodal non-convergence.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["coord_transform", "utm_forward", "utm_inverse",
           "geodesic_inverse", "great_circle_distance"]

_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563
_WGS84_B = _WGS84_A * (1 - _WGS84_F)
_UTM_K0 = 0.9996
_UTM_FE = 500000.0
_UTM_FN_S = 10000000.0

# Kruger series coefficients (n = third flattening)
_N = _WGS84_F / (2 - _WGS84_F)
_A_CAP = _WGS84_A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64
                                + _N ** 6 / 256)
_ALPHA = [
    _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16 + 41 * _N ** 4 / 180
    - 127 * _N ** 5 / 288 + 7891 * _N ** 6 / 37800,
    13 * _N ** 2 / 48 - 3 * _N ** 3 / 5 + 557 * _N ** 4 / 1440
    + 281 * _N ** 5 / 630 - 1983433 * _N ** 6 / 1935360,
    61 * _N ** 3 / 240 - 103 * _N ** 4 / 140 + 15061 * _N ** 5 / 26880
    + 167603 * _N ** 6 / 181440,
    49561 * _N ** 4 / 161280 - 179 * _N ** 5 / 168
    + 6601661 * _N ** 6 / 7257600,
    34729 * _N ** 5 / 80640 - 3418889 * _N ** 6 / 1995840,
    212378941 * _N ** 6 / 319334400,
]
_BETA = [
    _N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96 - _N ** 4 / 360
    - 81 * _N ** 5 / 512 + 96199 * _N ** 6 / 604800,
    _N ** 2 / 48 + _N ** 3 / 15 - 437 * _N ** 4 / 1440
    + 46 * _N ** 5 / 105 - 1118711 * _N ** 6 / 3870720,
    17 * _N ** 3 / 480 - 37 * _N ** 4 / 840 - 209 * _N ** 5 / 4480
    + 5569 * _N ** 6 / 90720,
    4397 * _N ** 4 / 161280 - 11 * _N ** 5 / 504
    - 830251 * _N ** 6 / 7257600,
    4583 * _N ** 5 / 161280 - 108847 * _N ** 6 / 3991680,
    20648693 * _N ** 6 / 638668800,
]


def utm_forward(lon, lat, zone, northern=True):
    """Geographic (degrees) -> UTM easting/northing via the Kruger
    transverse-Mercator series."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon) - lon0

    e = np.sqrt(_WGS84_F * (2 - _WGS84_F))
    # conformal latitude
    t = np.sinh(np.arctanh(np.sin(phi))
                - e * np.arctanh(e * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, (a) in enumerate(_ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)

    x = _UTM_K0 * _A_CAP * eta + _UTM_FE
    y = _UTM_K0 * _A_CAP * xi + (0.0 if northern else _UTM_FN_S)
    return x, y


def utm_inverse(x, y, zone, northern=True):
    """UTM easting/northing -> geographic lon/lat (degrees)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    xi = (y - (0.0 if northern else _UTM_FN_S)) / (_UTM_K0 * _A_CAP)
    eta = (x - _UTM_FE) / (_UTM_K0 * _A_CAP)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    e = np.sqrt(_WGS84_F * (2 - _WGS84_F))
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal -> geographic latitude by fixed-point iteration on
    # chi(phi) = arctan(sinh(artanh(sin phi) - e artanh(e sin phi)))
    phi = chi
    for _ in range(10):
        t = np.sinh(np.arctanh(np.sin(phi))
                    - e * np.arctanh(e * np.sin(phi)))
        phi = phi + (chi - np.arctan(t))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.rad2deg(lam + lon0)
    lat = np.rad2deg(phi)
    return lon, lat


def _webmercator_forward(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _WGS84_A * np.deg2rad(lon)
    y = _WGS84_A * np.log(np.tan(np.pi / 4 + np.deg2rad(lat) / 2))
    return x, y


def _webmercator_inverse(x, y):
    lon = np.rad2deg(np.asarray(x, dtype=np.float64) / _WGS84_A)
    lat = np.rad2deg(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64)
                                          / _WGS84_A)) - np.pi / 2)
    return lon, lat


@lru_cache(maxsize=16)
def _tm_consts(a, f):
    """Kruger series constants for an arbitrary ellipsoid (n = third
    flattening).  The module-level WGS84 constants are this function's
    output for (WGS84 a, f)."""
    n = f / (2 - f)
    A = a / (1 + n) * (1 + n ** 2 / 4 + n ** 4 / 64 + n ** 6 / 256)
    alpha = [
        n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16 + 41 * n ** 4 / 180
        - 127 * n ** 5 / 288 + 7891 * n ** 6 / 37800,
        13 * n ** 2 / 48 - 3 * n ** 3 / 5 + 557 * n ** 4 / 1440
        + 281 * n ** 5 / 630 - 1983433 * n ** 6 / 1935360,
        61 * n ** 3 / 240 - 103 * n ** 4 / 140 + 15061 * n ** 5 / 26880
        + 167603 * n ** 6 / 181440,
        49561 * n ** 4 / 161280 - 179 * n ** 5 / 168
        + 6601661 * n ** 6 / 7257600,
        34729 * n ** 5 / 80640 - 3418889 * n ** 6 / 1995840,
        212378941 * n ** 6 / 319334400,
    ]
    beta = [
        n / 2 - 2 * n ** 2 / 3 + 37 * n ** 3 / 96 - n ** 4 / 360
        - 81 * n ** 5 / 512 + 96199 * n ** 6 / 604800,
        n ** 2 / 48 + n ** 3 / 15 - 437 * n ** 4 / 1440
        + 46 * n ** 5 / 105 - 1118711 * n ** 6 / 3870720,
        17 * n ** 3 / 480 - 37 * n ** 4 / 840 - 209 * n ** 5 / 4480
        + 5569 * n ** 6 / 90720,
        4397 * n ** 4 / 161280 - 11 * n ** 5 / 504
        - 830251 * n ** 6 / 7257600,
        4583 * n ** 5 / 161280 - 108847 * n ** 6 / 3991680,
        20648693 * n ** 6 / 638668800,
    ]
    return A, tuple(alpha), tuple(beta)


def _tm_xi_eta(lon, lat, lon0_deg, a, f):
    """Conformal-sphere + Kruger series: geographic -> (xi, eta)."""
    A, alpha, _ = _tm_consts(a, f)
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64) - lon0_deg)
    e = np.sqrt(f * (2 - f))
    t = np.sinh(np.arctanh(np.sin(phi))
                - e * np.arctanh(e * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, al in enumerate(alpha, start=1):
        xi = xi + al * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + al * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return xi, eta, A


def _tm_forward(lon, lat, lat0, lon0, k0, fe, fn, a=_WGS84_A,
                f=_WGS84_F):
    """General Transverse Mercator (EPSG method 9807): arbitrary
    natural origin, scale and false offsets."""
    xi, eta, A = _tm_xi_eta(lon, lat, lon0, a, f)
    if lat0:
        xi0, _, _ = _tm_xi_eta(np.float64(lon0), np.float64(lat0),
                               lon0, a, f)
        m0 = A * float(xi0)
    else:
        m0 = 0.0
    x = fe + k0 * A * eta
    y = fn + k0 * (A * xi - m0)
    return x, y


def _tm_inverse(x, y, lat0, lon0, k0, fe, fn, a=_WGS84_A, f=_WGS84_F):
    A, _, beta = _tm_consts(a, f)
    if lat0:
        xi0, _, _ = _tm_xi_eta(np.float64(lon0), np.float64(lat0),
                               lon0, a, f)
        m0 = A * float(xi0)
    else:
        m0 = 0.0
    xi = (np.asarray(y, dtype=np.float64) - fn + k0 * m0) / (k0 * A)
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    e = np.sqrt(f * (2 - f))
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi
    for _ in range(10):
        t = np.sinh(np.arctanh(np.sin(phi))
                    - e * np.arctanh(e * np.sin(phi)))
        phi = phi + (chi - np.arctan(t))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.rad2deg(lam) + lon0, np.rad2deg(phi)


def _lcc_mt(phi, e):
    m = np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)
    t = (np.tan(np.pi / 4 - phi / 2)
         / ((1 - e * np.sin(phi)) / (1 + e * np.sin(phi))) ** (e / 2))
    return m, t


def _lcc_setup(lat0, sp1, sp2, k0, a, f):
    """Lambert Conformal Conic cone constants (EPSG 9802 two-SP when
    sp1/sp2 given, 9801 one-SP otherwise)."""
    e = np.sqrt(f * (2 - f))
    phi0 = np.deg2rad(lat0)
    _, t0 = _lcc_mt(np.float64(phi0), e)
    if sp1 is not None:
        p1 = np.deg2rad(sp1)
        p2 = np.deg2rad(sp2 if sp2 is not None else sp1)
        m1, t1 = _lcc_mt(np.float64(p1), e)
        m2, t2 = _lcc_mt(np.float64(p2), e)
        if abs(p1 - p2) > 1e-12:
            n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        else:
            n = np.sin(p1)
        F = m1 / (n * t1 ** n)
        rho0 = a * F * t0 ** n
    else:
        n = np.sin(phi0)
        m0, _ = _lcc_mt(np.float64(phi0), e)
        F = k0 * m0 / (n * t0 ** n)
        rho0 = a * F * t0 ** n
    return e, float(n), float(F), float(rho0)


def _lcc_forward(lon, lat, lat0, lon0, sp1, sp2, k0, fe, fn,
                 a=_WGS84_A, f=_WGS84_F):
    e, n, F, rho0 = _lcc_setup(lat0, sp1, sp2, k0, a, f)
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    _, t = _lcc_mt(phi, e)
    rho = a * F * t ** n
    theta = n * np.deg2rad(np.asarray(lon, dtype=np.float64) - lon0)
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def _lcc_inverse(x, y, lat0, lon0, sp1, sp2, k0, fe, fn,
                 a=_WGS84_A, f=_WGS84_F):
    e, n, F, rho0 = _lcc_setup(lat0, sp1, sp2, k0, a, f)
    dx = np.asarray(x, dtype=np.float64) - fe
    dy = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(dx, dy)
    theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    t = (rho / (a * F)) ** (1.0 / n)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(12):
        phi = (np.pi / 2
               - 2 * np.arctan(t * ((1 - e * np.sin(phi))
                                    / (1 + e * np.sin(phi))) ** (e / 2)))
    return np.rad2deg(theta / n) + lon0, np.rad2deg(phi)


def _aea_q(phi, e):
    """Authalic q (Snyder eq. 3-12)."""
    s = np.sin(phi)
    return (1 - e * e) * (s / (1 - (e * s) ** 2)
                          - np.log((1 - e * s) / (1 + e * s)) / (2 * e))


def _aea_setup(lat0, sp1, sp2, a, f):
    """Albers Equal Area cone constants (EPSG method 9822)."""
    e = np.sqrt(f * (2 - f))
    p0 = np.deg2rad(lat0)
    p1 = np.deg2rad(sp1)
    p2 = np.deg2rad(sp2 if sp2 is not None else sp1)
    m1 = np.cos(p1) / np.sqrt(1 - (e * np.sin(p1)) ** 2)
    m2 = np.cos(p2) / np.sqrt(1 - (e * np.sin(p2)) ** 2)
    q0, q1, q2 = (_aea_q(np.float64(p), e) for p in (p0, p1, p2))
    if abs(p1 - p2) > 1e-12:
        n = (m1 ** 2 - m2 ** 2) / (q2 - q1)
    else:
        n = np.sin(p1)
    C = m1 ** 2 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    return e, float(n), float(C), float(rho0)


def _aea_forward(lon, lat, lat0, lon0, sp1, sp2, fe, fn,
                 a=_WGS84_A, f=_WGS84_F):
    e, n, C, rho0 = _aea_setup(lat0, sp1, sp2, a, f)
    q = _aea_q(np.deg2rad(np.asarray(lat, dtype=np.float64)), e)
    rho = a * np.sqrt(np.maximum(C - n * q, 0.0)) / n
    theta = n * np.deg2rad(np.asarray(lon, dtype=np.float64) - lon0)
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def _aea_inverse(x, y, lat0, lon0, sp1, sp2, fe, fn,
                 a=_WGS84_A, f=_WGS84_F):
    e, n, C, rho0 = _aea_setup(lat0, sp1, sp2, a, f)
    dx = np.asarray(x, dtype=np.float64) - fe
    dy = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(dx, dy)
    theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    q = (C - (rho * n / a) ** 2) / n
    # fixed-point iteration for phi (Snyder eq. 3-16), started from the
    # spherical solution; poles guarded (cos phi -> 0 only when q is
    # the polar authalic limit, where the update term vanishes too)
    phi = np.arcsin(np.clip(q / 2, -1.0, 1.0))
    for _ in range(15):
        s = np.sin(phi)
        es = e * s
        upd = ((1 - es ** 2) ** 2 / np.maximum(2 * np.cos(phi), 1e-12)
               * (q / (1 - e * e) - s / (1 - es ** 2)
                  + np.log((1 - es) / (1 + es)) / (2 * e)))
        phi = phi + upd
    return np.rad2deg(theta / n) + lon0, np.rad2deg(phi)


def _ps_t(phi, e):
    """Polar stereographic isometric t (EPSG GN7-2, north form)."""
    s = e * np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) * ((1 + s) / (1 - s)) ** (e / 2)


def _ps_setup(lat_ts, lat0, k0, a, f):
    """rho(t) scale for EPSG 9829 (variant B, standard parallel
    ``lat_ts``) or 9810 (variant A, scale ``k0`` at the pole).
    Returns (e, north, rho_at_t1) with rho = rho_at_t1 * t."""
    e = np.sqrt(f * (2 - f))
    if lat_ts is not None:
        north = lat_ts > 0
        pts = np.deg2rad(abs(lat_ts))
        m = np.cos(pts) / np.sqrt(1 - (e * np.sin(pts)) ** 2)
        return e, north, a * m / float(_ps_t(np.float64(pts), e))
    north = lat0 > 0
    denom = np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
    return e, north, 2 * a * k0 / denom


def _ps_forward(lon, lat, lat_ts, lat0, k0, lon0, fe, fn,
                a=_WGS84_A, f=_WGS84_F):
    e, north, rf = _ps_setup(lat_ts, lat0, k0, a, f)
    sgn = 1.0 if north else -1.0
    phi = sgn * np.deg2rad(np.asarray(lat, dtype=np.float64))
    theta = np.deg2rad(np.asarray(lon, dtype=np.float64) - lon0)
    rho = rf * _ps_t(phi, e)
    # north: y decreases away from the pole along lon0; south mirrors
    return fe + rho * np.sin(theta), fn - sgn * rho * np.cos(theta)


def _ps_inverse(x, y, lat_ts, lat0, k0, lon0, fe, fn,
                a=_WGS84_A, f=_WGS84_F):
    e, north, rf = _ps_setup(lat_ts, lat0, k0, a, f)
    sgn = 1.0 if north else -1.0
    dx = np.asarray(x, dtype=np.float64) - fe
    dy = -sgn * (np.asarray(y, dtype=np.float64) - fn)
    t = np.hypot(dx, dy) / rf
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(12):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s))
                                        ** (e / 2))
    lam = np.arctan2(dx, dy)
    return np.rad2deg(lam) + lon0, sgn * np.rad2deg(phi)


_PROJ_DB = "/usr/share/proj/proj.db"

# EPSG unit-of-measure -> factor to metres / degrees
_LINEAR_UOM = {9001: 1.0, 9002: 0.3048, 9003: 1200.0 / 3937.0,
               9036: 1000.0}


def _angle_from_uom(v, uom):
    if uom == 9102:      # degree
        return float(v)
    if uom == 9110:      # sexagesimal DMS as DD.MMSSsss
        sign = -1.0 if v < 0 else 1.0
        v = abs(float(v))
        d = np.floor(v + 1e-12)
        rem = (v - d) * 100
        m = np.floor(rem + 1e-9)
        s = (rem - m) * 100
        return float(sign * (d + m / 60 + s / 3600))
    if uom == 9101:      # radian
        return float(np.rad2deg(v))
    raise ValueError(f"unsupported EPSG angle unit {uom}")


@lru_cache(maxsize=256)
def _epsg_db_params(code):
    """Projected-CRS parameters from the system PROJ database.

    Returns ``None`` when the database is missing or the code is not a
    supported projection method; raises for non-GRS80-class datums
    (a transform there needs datum-shift grids, not just formulas).
    """
    import os
    import sqlite3
    if not os.path.exists(_PROJ_DB):
        return None
    db = sqlite3.connect(_PROJ_DB)
    try:
        c = db.cursor()
        c.execute("SELECT coordinate_system_code, geodetic_crs_code, "
                  "conversion_code, name FROM projected_crs WHERE "
                  "auth_name='EPSG' AND code=?", (str(code),))
        row = c.fetchone()
        if row is None:
            return None
        cs_code, geod_code, conv_code, name = row
        c.execute("SELECT * FROM conversion_table WHERE "
                  "auth_name='EPSG' AND code=?", (str(conv_code),))
        conv = c.fetchone()
        if conv is None:
            return None
        cols = [d[0] for d in c.description]
        conv = dict(zip(cols, conv))
        method = conv["method_code"]
        if method not in (9807, 9802, 9801, 9822, 9829, 9810):
            return None
        params = {}
        for i in range(1, 8):
            pc = conv.get(f"param{i}_code")
            if pc is None:
                continue
            params[pc] = (conv[f"param{i}_value"],
                          conv[f"param{i}_uom_code"])
        # axis unit (metre / foot / ftUS)
        c.execute("SELECT uom_code FROM axis WHERE auth_name='EPSG' "
                  "AND coordinate_system_code=? ORDER BY "
                  "coordinate_system_order", (cs_code,))
        ax = c.fetchone()
        unit = _LINEAR_UOM.get(ax[0] if ax else 9001)
        if unit is None:
            raise ValueError(
                f"EPSG:{code} axis unit {ax[0]} not supported")
        # ellipsoid: must be GRS80/WGS84-class (no datum shift engine)
        c.execute(
            "SELECT e.semi_major_axis, e.inv_flattening, "
            "e.semi_minor_axis, e.name FROM geodetic_crs g "
            "JOIN geodetic_datum d ON d.code = g.datum_code "
            "AND d.auth_name = g.datum_auth_name "
            "JOIN ellipsoid e ON e.code = d.ellipsoid_code "
            "AND e.auth_name = d.ellipsoid_auth_name "
            "WHERE g.auth_name='EPSG' AND g.code=?", (geod_code,))
        ell = c.fetchone()
        a, invf, b, ell_name = ell
        f = 1.0 / invf if invf else (a - b) / a
        if abs(a - _WGS84_A) > 0.5 or abs(f - _WGS84_F) > 1e-6:
            raise ValueError(
                f"EPSG:{code} ({name}) is based on {ell_name}; only "
                "GRS80/WGS84-class datums are supported (NAD27-era "
                "codes need datum-shift grids)")

        def ang(pc, default=None):
            if pc not in params:
                return default
            return _angle_from_uom(*params[pc])

        def lin(pc, default=0.0):
            if pc not in params:
                return default
            v, uom = params[pc]
            return float(v) * _LINEAR_UOM[uom]

        if method == 9807:
            return {"method": "tm", "unit": unit, "a": a, "f": f,
                    "lat0": ang(8801, 0.0), "lon0": ang(8802, 0.0),
                    "k0": float(params.get(8805, (1.0, 9201))[0]),
                    "fe": lin(8806), "fn": lin(8807)}
        if method == 9802:
            return {"method": "lcc", "unit": unit, "a": a, "f": f,
                    "lat0": ang(8821, 0.0), "lon0": ang(8822, 0.0),
                    "sp1": ang(8823), "sp2": ang(8824), "k0": 1.0,
                    "fe": lin(8826), "fn": lin(8827)}
        if method == 9822:
            return {"method": "aea", "unit": unit, "a": a, "f": f,
                    "lat0": ang(8821, 0.0), "lon0": ang(8822, 0.0),
                    "sp1": ang(8823), "sp2": ang(8824),
                    "fe": lin(8826), "fn": lin(8827)}
        if method == 9829:
            return {"method": "ps", "unit": unit, "a": a, "f": f,
                    "lat_ts": ang(8832), "lat0": None, "k0": None,
                    "lon0": ang(8833, 0.0),
                    "fe": lin(8806), "fn": lin(8807)}
        if method == 9810:
            return {"method": "ps", "unit": unit, "a": a, "f": f,
                    "lat_ts": None, "lat0": ang(8801, 90.0),
                    "k0": float(params.get(8805, (1.0, 9201))[0]),
                    "lon0": ang(8802, 0.0),
                    "fe": lin(8806), "fn": lin(8807)}
        # 9801: one standard parallel at the natural origin
        return {"method": "lcc", "unit": unit, "a": a, "f": f,
                "lat0": ang(8801, 0.0), "lon0": ang(8802, 0.0),
                "sp1": None, "sp2": None,
                "k0": float(params.get(8805, (1.0, 9201))[0]),
                "fe": lin(8806), "fn": lin(8807)}
    finally:
        db.close()


def _db_forward(lon, lat, p):
    if p["method"] == "tm":
        x, y = _tm_forward(lon, lat, p["lat0"], p["lon0"], p["k0"],
                           p["fe"], p["fn"], p["a"], p["f"])
    elif p["method"] == "aea":
        x, y = _aea_forward(lon, lat, p["lat0"], p["lon0"], p["sp1"],
                            p["sp2"], p["fe"], p["fn"], p["a"], p["f"])
    elif p["method"] == "ps":
        x, y = _ps_forward(lon, lat, p["lat_ts"], p["lat0"], p["k0"],
                           p["lon0"], p["fe"], p["fn"], p["a"], p["f"])
    else:
        x, y = _lcc_forward(lon, lat, p["lat0"], p["lon0"], p["sp1"],
                            p["sp2"], p["k0"], p["fe"], p["fn"],
                            p["a"], p["f"])
    return x / p["unit"], y / p["unit"]


def _db_inverse(x, y, p):
    x = np.asarray(x, dtype=np.float64) * p["unit"]
    y = np.asarray(y, dtype=np.float64) * p["unit"]
    if p["method"] == "tm":
        return _tm_inverse(x, y, p["lat0"], p["lon0"], p["k0"],
                           p["fe"], p["fn"], p["a"], p["f"])
    if p["method"] == "aea":
        return _aea_inverse(x, y, p["lat0"], p["lon0"], p["sp1"],
                            p["sp2"], p["fe"], p["fn"], p["a"], p["f"])
    if p["method"] == "ps":
        return _ps_inverse(x, y, p["lat_ts"], p["lat0"], p["k0"],
                           p["lon0"], p["fe"], p["fn"], p["a"], p["f"])
    return _lcc_inverse(x, y, p["lat0"], p["lon0"], p["sp1"],
                        p["sp2"], p["k0"], p["fe"], p["fn"],
                        p["a"], p["f"])


def _parse_epsg(code):
    code = int(code)
    if code in (4326, 4269):
        # 4269 = NAD83 geographic.  GRS80 and WGS84 ellipsoids agree to
        # <0.1 mm in the projection series and the NAD83<->WGS84 datum
        # shift is ~1-2 m (below neilpy's DEM-cellsize accuracy class),
        # so NAD83 coordinates ride the same machinery.
        return ("geographic", None, None)
    if code == 3857:
        return ("webmercator", None, None)
    if 32601 <= code <= 32660:
        return ("utm", code - 32600, True)
    if 32701 <= code <= 32760:
        return ("utm", code - 32700, False)
    if 26901 <= code <= 26923:
        # NAD83 / UTM zones 1N-23N (US lidar's most common CRS family)
        return ("utm", code - 26900, True)
    # anything else: look the projection up in the system PROJ
    # database (covers the NAD83 State Plane zones and their ftUS
    # twins, among ~thousands of TM/LCC codes)
    p = _epsg_db_params(code)
    if p is not None:
        return ("db", p, None)
    raise ValueError(
        f"EPSG:{code} not supported by the built-in transform engine. "
        "Supported families: 4326 (WGS84 geographic), 4269 (NAD83 "
        "geographic), 326xx/327xx (WGS84 UTM north/south), 269xx "
        "(NAD83 UTM), 3857 (Web Mercator), plus any Transverse "
        "Mercator / Lambert Conformal Conic / Albers Equal Area / "
        "Polar Stereographic code on a GRS80-class datum resolvable "
        "via /usr/share/proj/proj.db (e.g. NAD83 State Plane, 5070 "
        "CONUS Albers, 3413/3031 polar)")


def coord_transform(x, y, from_epsg, to_epsg):
    """EPSG -> EPSG transform, ``always_xy`` ordering (parity:
    neilpy.py:108-110)."""
    kind_f, zone_f, north_f = _parse_epsg(from_epsg)
    if kind_f == "geographic":
        lon, lat = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    elif kind_f == "utm":
        lon, lat = utm_inverse(x, y, zone_f, north_f)
    elif kind_f == "db":
        lon, lat = _db_inverse(x, y, zone_f)
    else:
        lon, lat = _webmercator_inverse(x, y)

    kind_t, zone_t, north_t = _parse_epsg(to_epsg)
    if kind_t == "geographic":
        return lon, lat
    if kind_t == "utm":
        return utm_forward(lon, lat, zone_t, north_t)
    if kind_t == "db":
        return _db_forward(lon, lat, zone_t)
    return _webmercator_forward(lon, lat)


def geodesic_inverse(lon1, lat1, lon2, lat2, tol=1e-12, maxiter=200):
    """Vincenty inverse on WGS84: forward azimuth (deg), back azimuth
    (deg), distance (m)."""
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    a, b, f = _WGS84_A, _WGS84_B, _WGS84_F
    U1 = np.arctan((1 - f) * np.tan(np.deg2rad(lat1)))
    U2 = np.arctan((1 - f) * np.tan(np.deg2rad(lat2)))
    L = np.deg2rad(lon2 - lon1)
    lam = L.copy() if hasattr(L, "copy") else np.float64(L)
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)
    for _ in range(maxiter):
        sinl, cosl = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt((cosU2 * sinl) ** 2
                            + (cosU1 * sinU2 - sinU1 * cosU2 * cosl) ** 2)
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma != 0,
                                 cosU1 * cosU2 * sinl / sin_sigma, 0.0)
        cos2_alpha = 1 - sin_alpha ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2sm = np.where(cos2_alpha != 0,
                               cos_sigma - 2 * sinU1 * sinU2 / cos2_alpha,
                               0.0)
        C = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
        lam_new = (L + (1 - C) * f * sin_alpha *
                   (sigma + C * sin_sigma *
                    (cos_2sm + C * cos_sigma * (-1 + 2 * cos_2sm ** 2))))
        if np.all(np.abs(lam_new - lam) < tol):
            lam = lam_new
            break
        lam = lam_new
    u2 = cos2_alpha * (a ** 2 - b ** 2) / b ** 2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    sinl, cosl = np.sin(lam), np.cos(lam)
    sin_sigma = np.sqrt((cosU2 * sinl) ** 2
                        + (cosU1 * sinU2 - sinU1 * cosU2 * cosl) ** 2)
    cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
    sigma = np.arctan2(sin_sigma, cos_sigma)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos_2sm = np.where(cos2_alpha != 0,
                           cos_sigma - 2 * sinU1 * sinU2 / cos2_alpha, 0.0)
    dsigma = (B * sin_sigma *
              (cos_2sm + B / 4 *
               (cos_sigma * (-1 + 2 * cos_2sm ** 2)
                - B / 6 * cos_2sm * (-3 + 4 * sin_sigma ** 2)
                * (-3 + 4 * cos_2sm ** 2))))
    dist = b * A * (sigma - dsigma)
    fwd = np.rad2deg(np.arctan2(cosU2 * sinl,
                                cosU1 * sinU2 - sinU1 * cosU2 * cosl))
    back = np.rad2deg(np.arctan2(cosU1 * sinl,
                                 -sinU1 * cosU2 + cosU1 * sinU2 * cosl))
    return fwd, back, dist


def great_circle_distance(slat, slon, elat, elon, radius=6372795):
    """Spherical law-of-cosines distance (parity: neilpy.py:888-898)."""
    slat, slon = np.deg2rad(slat), np.deg2rad(slon)
    elat, elon = np.deg2rad(elat), np.deg2rad(elon)
    return np.arccos(np.cos(slat) * np.cos(slon) * np.cos(elat) * np.cos(elon)
                     + np.cos(slat) * np.sin(slon) * np.cos(elat) * np.sin(elon)
                     + np.sin(slat) * np.sin(elat)) * radius
