"""WGS84 -> conic projections (Lambert conformal 2SP, Albers
equal-area), vectorized forward transforms.

The two projections real raster corpora actually ship in beyond UTM
(reference surface: ``vectorutils.reproj_vec_lyr`` /
``reproj_wgs84_vec_to_utm``, /root/reference/python/rsgislib/
vectorutils/__init__.py:804 — the reference delegates to osgeo.osr;
no proj database exists in this sandbox, so the engine implements the
closed forms directly). Formulas are the published Snyder series (Map
Projections — A Working Manual, USGS PP 1395: eq. 15-1..15-10 for
LCC, 14-1..14-6 for Albers) on the WGS84 ellipsoid.

Exactness discipline (same as functions/utm.py): the projection
CONSTANTS (n, F, rho0 / C) are evaluated once in Python and inlined
as full-precision literals into both the engine and the SQL oracle —
only the per-point chain (sin/cos/tan/ln/pow) can diverge from DuckDB
by 1 ULP, which the tenth-millimetre integer floors absorb.
"""

from __future__ import annotations

import math

import numpy as np

#: WGS84
A = 6378137.0
E2 = 0.00669438
E = math.sqrt(E2)
D2R = 0.017453292519943295


def _m(phi: float) -> float:
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - E2 * s * s)


def _t(phi: float) -> float:
    s = math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - E * s) / (1.0 + E * s)
    ) ** (E / 2.0)


def _q(phi: float) -> float:
    s = math.sin(phi)
    return (1.0 - E2) * (
        s / (1.0 - E2 * s * s)
        - (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s))
    )


def lcc_constants(
    lat1: float, lat2: float, lat0: float, lon0: float, fe: float, fn: float
) -> dict:
    """Two-standard-parallel Lambert conformal conic constants
    (Snyder 15-1..15-10), evaluated once in double precision."""
    p1, p2, p0 = lat1 * D2R, lat2 * D2R, lat0 * D2R
    n = (math.log(_m(p1)) - math.log(_m(p2))) / (
        math.log(_t(p1)) - math.log(_t(p2))
    )
    F = _m(p1) / (n * _t(p1) ** n)
    rho0 = A * F * _t(p0) ** n
    return {"n": n, "F": F, "rho0": rho0, "lon0": lon0, "fe": fe, "fn": fn}


def albers_constants(
    lat1: float, lat2: float, lat0: float, lon0: float, fe: float, fn: float
) -> dict:
    """Albers equal-area conic constants (Snyder 14-1..14-6)."""
    p1, p2, p0 = lat1 * D2R, lat2 * D2R, lat0 * D2R
    m1, m2 = _m(p1), _m(p2)
    q1, q2, q0 = _q(p1), _q(p2), _q(p0)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = A * math.sqrt(C - n * q0) / n
    return {"n": n, "C": C, "rho0": rho0, "lon0": lon0, "fe": fe, "fn": fn}


def lcc_forward(lat: np.ndarray, lon: np.ndarray, c: dict):
    """Vectorized LCC 2SP forward: returns (easting, northing) in
    metres. Per-point chain mirrors the SQL oracle term for term."""
    phi = lat * D2R
    s = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - E * s) / (1.0 + E * s)
    ) ** (E / 2.0)
    rho = A * c["F"] * t ** c["n"]
    th = c["n"] * (lon - c["lon0"]) * D2R
    x = rho * np.sin(th) + c["fe"]
    y = c["rho0"] - rho * np.cos(th) + c["fn"]
    return x, y


def albers_forward(lat: np.ndarray, lon: np.ndarray, c: dict):
    """Vectorized Albers equal-area forward: (easting, northing) m."""
    phi = lat * D2R
    s = np.sin(phi)
    q = (1.0 - E2) * (
        s / (1.0 - E2 * s * s)
        - (1.0 / (2.0 * E)) * np.log((1.0 - E * s) / (1.0 + E * s))
    )
    rho = A * np.sqrt(c["C"] - c["n"] * q) / c["n"]
    th = c["n"] * (lon - c["lon0"]) * D2R
    x = rho * np.sin(th) + c["fe"]
    y = c["rho0"] - rho * np.cos(th) + c["fn"]
    return x, y


#: fixed inverse-iteration counts — identical in the engine and the
#: unrolled SQL oracle, so both sides compute the SAME float chain
#: (the kmeans_exact unrolled-iteration discipline); 8 rounds of the
#: linearly-converging (rate ~e^2/2) fixpoints is far past double
#: precision for |lat| <= 80
LCC_INV_ITERS = 8
ALBERS_INV_ITERS = 8


def lcc_inverse(x: np.ndarray, y: np.ndarray, c: dict):
    """LCC 2SP inverse (Snyder 15-14..15-17 + the eq. 7-9 latitude
    fixpoint, FIXED ``LCC_INV_ITERS`` rounds). Requires ``n > 0``
    (northern-parallel parameterizations — both shipped constants).
    Returns (lat_deg, lon_deg)."""
    if not c["n"] > 0:
        raise ValueError("lcc_inverse implements the n > 0 branch only")
    xp = x - c["fe"]
    yp = c["rho0"] - (y - c["fn"])
    rho = np.sqrt(xp * xp + yp * yp)
    t = (rho / (A * c["F"])) ** (1.0 / c["n"])
    th = np.arctan2(xp, yp)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(LCC_INV_ITERS):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - E * s) / (1.0 + E * s)) ** (E / 2.0)
        )
    return phi / D2R, th / c["n"] / D2R + c["lon0"]


def albers_inverse(x: np.ndarray, y: np.ndarray, c: dict):
    """Albers equal-area inverse (Snyder 14-19..14-21 + the eq. 3-16
    latitude fixpoint, FIXED ``ALBERS_INV_ITERS`` rounds, ``n > 0``).
    Returns (lat_deg, lon_deg)."""
    if not c["n"] > 0:
        raise ValueError("albers_inverse implements the n > 0 branch only")
    xp = x - c["fe"]
    yp = c["rho0"] - (y - c["fn"])
    rho = np.sqrt(xp * xp + yp * yp)
    th = np.arctan2(xp, yp)
    q = (c["C"] - (rho * c["n"] / A) ** 2) / c["n"]
    phi = np.arcsin(q / 2.0)
    for _ in range(ALBERS_INV_ITERS):
        s = np.sin(phi)
        e2s = 1.0 - E2 * s * s
        phi = phi + (e2s * e2s) / (2.0 * np.cos(phi)) * (
            q / (1.0 - E2)
            - s / e2s
            + (1.0 / (2.0 * E)) * np.log((1.0 - E * s) / (1.0 + E * s))
        )
    return phi / D2R, th / c["n"] / D2R + c["lon0"]


#: Lambert-93-shaped parameterization (RGF93 layout on the WGS84
#: ellipsoid — standard parallels 44/49, origin 46.5N 3E, the French
#: national grid's false origin)
LCC_FR = lcc_constants(49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0)
#: CONUS Albers parameterization (EPSG:5070 layout on WGS84:
#: parallels 29.5/45.5, origin 23N 96W)
ALBERS_CONUS = albers_constants(29.5, 45.5, 23.0, -96.0, 0.0, 0.0)


def lcc_oracle_sql_chain(c: dict, lat_expr: str, lon_expr: str) -> tuple:
    """(easting_sql, northing_sql) mirroring :func:`lcc_forward` with
    the constants inlined as full-precision literals."""
    t = (
        f"(TAN(0.7853981633974483e0 - ({lat_expr}) * {D2R!r}e0 / 2.0e0)"
        f" / POWER((1.0e0 - {E!r}e0 * SIN(({lat_expr}) * {D2R!r}e0))"
        f" / (1.0e0 + {E!r}e0 * SIN(({lat_expr}) * {D2R!r}e0)),"
        f" {E / 2.0!r}e0))"
    )
    rho = f"({A!r}e0 * {c['F']!r}e0 * POWER({t}, {c['n']!r}e0))"
    th = f"({c['n']!r}e0 * (({lon_expr}) - {c['lon0']!r}e0) * {D2R!r}e0)"
    return (
        f"({rho} * SIN({th}) + {c['fe']!r}e0)",
        f"({c['rho0']!r}e0 - {rho} * COS({th}) + {c['fn']!r}e0)",
    )


def albers_oracle_sql_chain(c: dict, lat_expr: str, lon_expr: str) -> tuple:
    """(easting_sql, northing_sql) mirroring :func:`albers_forward`."""
    s = f"SIN(({lat_expr}) * {D2R!r}e0)"
    q = (
        f"({1.0 - E2!r}e0 * ({s} / (1.0e0 - {E2!r}e0 * {s} * {s})"
        f" - {1.0 / (2.0 * E)!r}e0"
        f" * LN((1.0e0 - {E!r}e0 * {s}) / (1.0e0 + {E!r}e0 * {s}))))"
    )
    rho = f"({A!r}e0 * SQRT({c['C']!r}e0 - {c['n']!r}e0 * {q}) / {c['n']!r}e0)"
    th = f"({c['n']!r}e0 * (({lon_expr}) - {c['lon0']!r}e0) * {D2R!r}e0)"
    return (
        f"({rho} * SIN({th}) + {c['fe']!r}e0)",
        f"({c['rho0']!r}e0 - {rho} * COS({th}) + {c['fn']!r}e0)",
    )
