"""WGS84 -> UTM forward projection (vectorized).

Reimplements ``tools/utm.py:from_latlon`` (/root/reference/python/
rsgislib/tools/utm.py:285-381) and its zone helpers (:383-430) — the
engine behind ``vectorutils.reproj_wgs84_vec_to_utm``. Constants and
series terms are copied from the reference's published formula
(standard Krüger series, the same as the public `utm` package the
reference vendored).

Unlike the reference (scalar zone for the whole layer), the zone
number/letter are computed PER POINT with the same formulas; callers
spanning multiple zones get per-point zones (the reference's
documented single-zone restriction becomes a non-issue).
"""

from __future__ import annotations

import numpy as np

E = 0.00669438
E2 = E * E
E3 = E2 * E
E_P2 = E / (1.0 - E)
M1 = 1 - E / 4 - 3 * E2 / 64 - 5 * E3 / 256
M2 = 3 * E / 8 + 3 * E2 / 32 + 45 * E3 / 1024
M3 = 15 * E2 / 256 + 45 * E3 / 1024
M4 = 35 * E3 / 3072
R = 6378137
K0 = 0.9996
ZONE_LETTERS = "CDEFGHJKLMNPQRSTUVWXX"
D2R = 0.017453292519943295


def zone_number(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """latlon_to_zone_number (:400), vectorized incl. the Norway (32V)
    and Svalbard exceptions."""
    z = (np.floor((lon + 180.0) / 6.0) + 1).astype(np.int64)
    z = np.where((lat >= 56) & (lat < 64) & (lon >= 3) & (lon < 12), 32, z)
    sval = (lat >= 72) & (lat <= 84) & (lon >= 0)
    z = np.where(sval & (lon < 9), 31, z)
    z = np.where(sval & (lon >= 9) & (lon < 21), 33, z)
    z = np.where(sval & (lon >= 21) & (lon < 33), 35, z)
    z = np.where(sval & (lon >= 33) & (lon < 42), 37, z)
    return z


def zone_letter_index(lat: np.ndarray) -> np.ndarray:
    """Index into ZONE_LETTERS (latitude_to_zone_letter, :383);
    valid for -80 <= lat <= 84."""
    return (lat + 80.0).astype(np.int64) >> 3


def utm_from_latlon(lat: np.ndarray, lon: np.ndarray):
    """from_latlon (:285): returns (easting, northing, zone_number,
    zone_letter_idx). Northern-hemisphere northing (the fixture
    contract; southern adds 1e7 as in the reference :377)."""
    lat_rad = lat * D2R
    lat_sin = np.sin(lat_rad)
    lat_cos = np.cos(lat_rad)
    lat_tan = lat_sin / lat_cos
    lat_tan2 = lat_tan * lat_tan
    lat_tan4 = lat_tan2 * lat_tan2
    zn = zone_number(lat, lon)
    lon_rad = lon * D2R
    central_lon = (zn - 1) * 6 - 180 + 3  # zone_number_to_central_longitude
    central_lon_rad = central_lon.astype(np.float64) * D2R
    n = R / np.sqrt(1 - E * lat_sin**2)
    c = E_P2 * lat_cos**2
    a = lat_cos * (lon_rad - central_lon_rad)
    a2 = a * a
    a3 = a2 * a
    a4 = a3 * a
    a5 = a4 * a
    a6 = a5 * a
    m = R * (
        M1 * lat_rad
        - M2 * np.sin(2 * lat_rad)
        + M3 * np.sin(4 * lat_rad)
        - M4 * np.sin(6 * lat_rad)
    )
    easting = (
        K0
        * n
        * (
            a
            + a3 / 6 * (1 - lat_tan2 + c)
            + a5 / 120 * (5 - 18 * lat_tan2 + lat_tan4 + 72 * c - 58 * E_P2)
        )
        + 500000
    )
    northing = K0 * (
        m
        + n
        * lat_tan
        * (
            a2 / 2
            + a4 / 24 * (5 - lat_tan2 + 9 * c + 4 * c**2)
            + a6 / 720 * (61 - 58 * lat_tan2 + lat_tan4 + 600 * c - 330 * E_P2)
        )
    )
    return easting, northing, zn, zone_letter_index(lat)


# --- inverse (to_latlon) series constants (tools/utm.py:12-36) ---
import math as _math

SQRT_E = _math.sqrt(1.0 - E)
_EI = (1.0 - SQRT_E) / (1.0 + SQRT_E)
_EI2 = _EI * _EI
_EI3 = _EI2 * _EI
_EI4 = _EI3 * _EI
_EI5 = _EI4 * _EI
P2 = 3.0 / 2 * _EI - 27.0 / 32 * _EI3 + 269.0 / 512 * _EI5
P3 = 21.0 / 16 * _EI2 - 55.0 / 32 * _EI4
P4 = 151.0 / 96 * _EI3 - 417.0 / 128 * _EI5
P5 = 1097.0 / 512 * _EI4
RAD2DEG = 57.29577951308232


def utm_to_latlon(
    easting: np.ndarray,
    northing: np.ndarray,
    zone: np.ndarray,
    northern: bool = True,
):
    """``to_latlon`` (/root/reference/python/rsgislib/tools/utm.py:
    185-283), vectorized: the published Krueger inverse series, term
    for term — including the reference's own placement of the d6
    latitude term outside the (tan/r) factor (harmless at ~1e-9 rad;
    parity beats Snyder here). Returns (lat_deg, lon_deg)."""
    x = easting - 500000.0
    y = np.asarray(northing, dtype=np.float64)
    if not northern:
        y = y - 10000000.0
    m = y / K0
    mu = m / (R * M1)
    p_rad = (
        mu
        + P2 * np.sin(2 * mu)
        + P3 * np.sin(4 * mu)
        + P4 * np.sin(6 * mu)
        + P5 * np.sin(8 * mu)
    )
    p_sin = np.sin(p_rad)
    p_sin2 = p_sin * p_sin
    p_cos = np.cos(p_rad)
    p_tan = p_sin / p_cos
    p_tan2 = p_tan * p_tan
    p_tan4 = p_tan2 * p_tan2
    ep_sin = 1 - E * p_sin2
    ep_sin_sqrt = np.sqrt(1 - E * p_sin2)
    n = R / ep_sin_sqrt
    r = (1 - E) / ep_sin
    c = _EI * p_cos**2
    c2 = c * c
    d = x / (n * K0)
    d2 = d * d
    d3 = d2 * d
    d4 = d3 * d
    d5 = d4 * d
    d6 = d5 * d
    latitude = (
        p_rad
        - (p_tan / r)
        * (d2 / 2 - d4 / 24 * (5 + 3 * p_tan2 + 10 * c - 4 * c2 - 9 * E_P2))
        + d6 / 720 * (61 + 90 * p_tan2 + 298 * c + 45 * p_tan4
                      - 252 * E_P2 - 3 * c2)
    )
    longitude = (
        d
        - d3 / 6 * (1 + 2 * p_tan2 + c)
        + d5 / 120 * (5 - 2 * c + 28 * p_tan2 - 3 * c2 + 8 * E_P2
                      + 24 * p_tan4)
    ) / p_cos
    lon0 = (zone.astype(np.float64) - 1.0) * 6.0 - 180.0 + 3.0
    return latitude * RAD2DEG, longitude * RAD2DEG + lon0


# --- generalized transverse Mercator (non-UTM parameterizations) ---


def tmerc_constants(
    lat0: float, lon0: float, k0: float, fe: float, fn: float
) -> dict:
    """Arbitrary transverse-Mercator parameterization (natural-origin
    lat0/lon0, scale k0, false easting/northing) on WGS84 — the same
    Krueger series as the UTM pair, with the origin meridian arc m0
    evaluated once (VERDICT r3 #4: rasters shipped in national TM
    grids that are not UTM, e.g. the British grid's layout)."""
    lat0r = lat0 * D2R
    m0 = R * (
        M1 * lat0r
        - M2 * _math.sin(2.0 * lat0r)
        + M3 * _math.sin(4.0 * lat0r)
        - M4 * _math.sin(6.0 * lat0r)
    )
    return {"lat0": lat0, "lon0": lon0, "k0": k0, "fe": fe, "fn": fn, "m0": m0}


def tmerc_forward(lat: np.ndarray, lon: np.ndarray, c: dict):
    """Krueger forward with arbitrary constants — term-for-term the
    :func:`utm_from_latlon` series (reference tools/utm.py:285-381)
    with (k0, lon0, fe, fn, m0) from ``c``."""
    lat_rad = lat * D2R
    lat_sin = np.sin(lat_rad)
    lat_cos = np.cos(lat_rad)
    lat_tan = lat_sin / lat_cos
    lat_tan2 = lat_tan * lat_tan
    lat_tan4 = lat_tan2 * lat_tan2
    lon_rad = lon * D2R
    k0 = c["k0"]
    central_lon_rad = c["lon0"] * D2R
    n = R / np.sqrt(1 - E * lat_sin**2)
    cc = E_P2 * lat_cos**2
    a = lat_cos * (lon_rad - central_lon_rad)
    a2 = a * a
    a3 = a2 * a
    a4 = a3 * a
    a5 = a4 * a
    a6 = a5 * a
    m = R * (
        M1 * lat_rad
        - M2 * np.sin(2 * lat_rad)
        + M3 * np.sin(4 * lat_rad)
        - M4 * np.sin(6 * lat_rad)
    )
    easting = (
        k0
        * n
        * (
            a
            + a3 / 6 * (1 - lat_tan2 + cc)
            + a5 / 120 * (5 - 18 * lat_tan2 + lat_tan4 + 72 * cc - 58 * E_P2)
        )
        + c["fe"]
    )
    northing = (
        k0
        * (
            m
            - c["m0"]
            + n
            * lat_tan
            * (
                a2 / 2
                + a4 / 24 * (5 - lat_tan2 + 9 * cc + 4 * cc**2)
                + a6
                / 720
                * (61 - 58 * lat_tan2 + lat_tan4 + 600 * cc - 330 * E_P2)
            )
        )
        + c["fn"]
    )
    return easting, northing


def tmerc_inverse(easting: np.ndarray, northing: np.ndarray, c: dict):
    """Krueger inverse with arbitrary constants — term-for-term the
    :func:`utm_to_latlon` series with (k0, lon0, fe, fn, m0) from
    ``c``. Returns (lat_deg, lon_deg)."""
    x = easting - c["fe"]
    m = (np.asarray(northing, dtype=np.float64) - c["fn"]) / c["k0"] + c["m0"]
    mu = m / (R * M1)
    p_rad = (
        mu
        + P2 * np.sin(2 * mu)
        + P3 * np.sin(4 * mu)
        + P4 * np.sin(6 * mu)
        + P5 * np.sin(8 * mu)
    )
    p_sin = np.sin(p_rad)
    p_sin2 = p_sin * p_sin
    p_cos = np.cos(p_rad)
    p_tan = p_sin / p_cos
    p_tan2 = p_tan * p_tan
    p_tan4 = p_tan2 * p_tan2
    ep_sin = 1 - E * p_sin2
    n = R / np.sqrt(1 - E * p_sin2)
    r = (1 - E) / ep_sin
    cc = _EI * p_cos**2
    c2 = cc * cc
    d = x / (n * c["k0"])
    d2 = d * d
    d3 = d2 * d
    d4 = d3 * d
    d5 = d4 * d
    d6 = d5 * d
    latitude = (
        p_rad
        - (p_tan / r)
        * (d2 / 2 - d4 / 24 * (5 + 3 * p_tan2 + 10 * cc - 4 * c2 - 9 * E_P2))
        + d6 / 720 * (61 + 90 * p_tan2 + 298 * cc + 45 * p_tan4
                      - 252 * E_P2 - 3 * c2)
    )
    longitude = (
        d
        - d3 / 6 * (1 + 2 * p_tan2 + cc)
        + d5 / 120 * (5 - 2 * cc + 28 * p_tan2 - 3 * c2 + 8 * E_P2
                      + 24 * p_tan4)
    ) / p_cos
    return latitude * RAD2DEG, longitude * RAD2DEG + c["lon0"]


#: British-national-grid-shaped parameterization (OSGB layout on the
#: WGS84 ellipsoid: natural origin 49N 2W, k0 = 0.9996012717, false
#: origin 400km E / -100km N)
TMERC_GB = tmerc_constants(49.0, -2.0, 0.9996012717, 400000.0, -100000.0)


def zone_number_rint(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """latlon_arr_to_utm_zone_number (tools/utm.py:432): the ARRAY
    variant computes rint((lon+180)/6 + 1) — round-to-nearest, unlike
    from_latlon's floor — then applies the Norway/Svalbard overrides
    as SEQUENTIAL overwrites whose conditions nest (31 for lon<9, 33
    for lon<21, 35 for lon<33, 37 for lon<42, each including the
    previous range), so in the 72..84 band every 0<=lon<42 pixel ends
    at 37 and 31/33/35 never survive. That last-wins quirk is the
    reference's literal behavior and is mirrored by the SQL CASE in
    reverse-assignment order."""
    z = np.rint((lon + 180.0) / 6.0 + 1.0).astype(np.int64)
    z = np.where(
        (lat >= 56) & (lat < 64) & (lon >= 3) & (lon < 12), 32, z
    )
    sval = (72 <= lat) & (lat <= 84) & (lon >= 0)
    z = np.where(sval & (lon < 9), 31, z)
    z = np.where(sval & (lon < 21), 33, z)
    z = np.where(sval & (lon < 33), 35, z)
    z = np.where(sval & (lon < 42), 37, z)
    return z
