"""WGS-84 geodesy scalar kernels (tools/projection.py:66
``degrees_to_metres``, :100 ``metres_to_degrees``, :160
``great_circle_distance``), vectorized for ``map_batches``.

Every chain is written in one fixed operation order shared with the
SQL oracle generator; ``deg2rad`` is an explicit multiplication by the
``repr(pi/180)`` literal (never the engine-side RADIANS builtin) and
``Rsq^1.5`` is written ``Rsq·√Rsq`` on BOTH sides (algebraically equal
to the reference's ``**1.5`` but bit-stable across libm/DuckDB pow).
Trig outputs carry the known 1-ulp libm/DuckDB divergence, so query
results are half-up micro-quantized (the wgs84_pixel_size
convention)."""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_B = 6356752.314245
DEG2RAD = 0.017453292519943295  # repr(math.pi / 180.0): the SQL literal


def degrees_to_metres(
    lat_deg: np.ndarray, lon_size: np.ndarray, lat_size: np.ndarray
):
    """Metres per ``lon_size``/``lat_size`` degrees at latitude
    (meridional radius for y, normal radius × cos(lat) for x)."""
    radlat = lat_deg * DEG2RAD
    c = np.cos(radlat)
    s = np.sin(radlat)
    rsq = (WGS84_A * c) * (WGS84_A * c) + (WGS84_B * s) * (WGS84_B * s)
    mlat = ((WGS84_A * WGS84_B) * (WGS84_A * WGS84_B)) / (
        rsq * np.sqrt(rsq)
    )
    nlon = (WGS84_A * WGS84_A) / np.sqrt(rsq)
    x_size = ((DEG2RAD * c) * nlon) * lon_size
    y_size = (DEG2RAD * mlat) * lat_size
    return x_size, y_size


def metres_to_degrees(
    lat_deg: np.ndarray, x_size: np.ndarray, y_size: np.ndarray
):
    """Inverse of :func:`degrees_to_metres` (same radii chains)."""
    radlat = lat_deg * DEG2RAD
    c = np.cos(radlat)
    s = np.sin(radlat)
    rsq = (WGS84_A * c) * (WGS84_A * c) + (WGS84_B * s) * (WGS84_B * s)
    mlat = ((WGS84_A * WGS84_B) * (WGS84_A * WGS84_B)) / (
        rsq * np.sqrt(rsq)
    )
    nlon = (WGS84_A * WGS84_A) / np.sqrt(rsq)
    lon_size = x_size / ((DEG2RAD * c) * nlon)
    lat_size = y_size / (DEG2RAD * mlat)
    return lon_size, lat_size


def great_circle_distance(
    lon1: np.ndarray,
    lat1: np.ndarray,
    lon2: np.ndarray,
    lat2: np.ndarray,
    earth_radius: float = 6378137.0,
) -> np.ndarray:
    """Spherical law-of-cosines great-circle distance
    (great_circle_distance, tools/projection.py:160: the reference's
    exact formula incl. the |Δlon| fold; the input-range validation is
    the caller's job on a lattice fixture)."""
    r1x = lon1 * DEG2RAD
    r1y = lat1 * DEG2RAD
    r2x = lon2 * DEG2RAD
    r2y = lat2 * DEG2RAD
    dlon = np.abs(r1x - r2x)
    ca = np.arccos(
        np.sin(r1y) * np.sin(r2y)
        + (np.cos(r1y) * np.cos(r2y)) * np.cos(dlon)
    )
    return earth_radius * ca
