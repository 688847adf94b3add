"""Pure-numpy coordinate transforms (no pyproj in the runtime image).

Parity surface: ``coord_transform(x, y, from_epsg, to_epsg)``
(reference neilpy/neilpy.py:108-110) and the geodesic helpers used by
the photogrammetry stack (track2azimuth via pyproj.Geod at
neilpy.py:2425-2440; great_circle_distance at neilpy.py:888-898).

Implemented CRS families (covers the reference's documented usage —
WGS84 geographic <-> UTM zones <-> Web Mercator):

* EPSG:4326  WGS84 geographic (lon/lat degrees)
* EPSG:326xx / 327xx  WGS84 UTM north/south zones (transverse
  Mercator, Kruger 6th-order series — sub-mm vs pyproj inside zones)
* EPSG:3857  Web/spherical Mercator

Geodesics on the WGS84 ellipsoid use Vincenty's inverse formula with a
spherical fallback at antipodal non-convergence.
"""

from __future__ import annotations

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
    raise ValueError(
        f"EPSG:{code} not supported by the built-in transform engine. "
        "Supported families: 4326 (WGS84 geographic), 4269 (NAD83 "
        "geographic), 326xx/327xx (WGS84 UTM north/south), 269xx "
        "(NAD83 UTM), 3857 (Web Mercator)")


def coord_transform(x, y, from_epsg, to_epsg):
    """EPSG -> EPSG transform, ``always_xy`` ordering (parity:
    neilpy.py:108-110)."""
    kind_f, zone_f, north_f = _parse_epsg(from_epsg)
    if kind_f == "geographic":
        lon, lat = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    elif kind_f == "utm":
        lon, lat = utm_inverse(x, y, zone_f, north_f)
    else:
        lon, lat = _webmercator_inverse(x, y)

    kind_t, zone_t, north_t = _parse_epsg(to_epsg)
    if kind_t == "geographic":
        return lon, lat
    if kind_t == "utm":
        return utm_forward(lon, lat, zone_t, north_t)
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
