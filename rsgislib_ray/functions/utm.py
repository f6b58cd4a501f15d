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
