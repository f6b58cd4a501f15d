"""Conic projections (functions/conic.py): origin exactness, known
reference points, equal-area property for Albers."""

import numpy as np


def test_lcc_origin():
    from rsgislib_ray.functions.conic import LCC_FR, lcc_forward

    # the projection origin maps exactly to the false origin
    e, n = lcc_forward(np.array([46.5]), np.array([3.0]), LCC_FR)
    assert abs(e[0] - 700000.0) < 1e-6
    assert abs(n[0] - 6600000.0) < 1e-6


def test_snyder_worked_examples():
    """Snyder PP1395 numerical examples (Clarke 1866 ellipsoid):
    LCC p.296 and Albers p.292, published to 0.1 m."""
    import math

    import rsgislib_ray.functions.conic as c

    saved = (c.A, c.E2, c.E)
    try:
        c.A, c.E2 = 6378206.4, 0.00676866
        c.E = math.sqrt(c.E2)
        lcc = c.lcc_constants(33.0, 45.0, 23.0, -96.0, 0.0, 0.0)
        x, y = c.lcc_forward(np.array([35.0]), np.array([-75.0]), lcc)
        assert abs(x[0] - 1894410.9) < 0.2
        assert abs(y[0] - 1564649.5) < 0.2
        alb = c.albers_constants(29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
        x, y = c.albers_forward(np.array([35.0]), np.array([-75.0]), alb)
        assert abs(x[0] - 1885472.7) < 0.2
        assert abs(y[0] - 1535925.0) < 0.2
    finally:
        c.A, c.E2, c.E = saved


def test_albers_origin_and_area_preservation():
    from rsgislib_ray.functions.conic import ALBERS_CONUS, albers_forward

    e, n = albers_forward(np.array([23.0]), np.array([-96.0]), ALBERS_CONUS)
    assert abs(e[0]) < 1e-6 and abs(n[0]) < 1e-6
    # equal-area: the projected area of a small geodesic quad equals
    # its ellipsoidal area (Jacobian == 1) to first order
    lat, lon, d = 39.0, -100.0, 0.01
    quad_lat = np.array([lat, lat, lat + d, lat + d])
    quad_lon = np.array([lon, lon + d, lon + d, lon])
    xs, ys = albers_forward(quad_lat, quad_lon, ALBERS_CONUS)
    # shoelace
    area_proj = 0.5 * abs(
        np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))
    )
    # ellipsoidal quad area via authalic radius approximation
    R_auth = 6371007.2
    area_true = (
        (R_auth * np.radians(d)) ** 2 * np.cos(np.radians(lat + d / 2))
    )
    assert abs(area_proj / area_true - 1.0) < 5e-3


def test_lcc_conformal_shape():
    """Conformality: a tiny square stays a square (aspect ratio ~1,
    right angles) under LCC."""
    from rsgislib_ray.functions.conic import LCC_FR, lcc_forward

    lat, lon, d = 47.0, 1.0, 0.001
    # east-step and north-step vectors
    x0, y0 = lcc_forward(np.array([lat]), np.array([lon]), LCC_FR)
    xe, ye = lcc_forward(np.array([lat]), np.array([lon + d]), LCC_FR)
    xn, yn = lcc_forward(np.array([lat + d]), np.array([lon]), LCC_FR)
    ve = np.array([xe[0] - x0[0], ye[0] - y0[0]])
    vn = np.array([xn[0] - x0[0], yn[0] - y0[0]])
    # conformal: |east step| / |north step| equals the ellipsoidal
    # ground-arc ratio nu*cos(lat)/M = cos(lat)(1-e^2 sin^2)/(1-e^2)
    e2 = 0.00669438
    s2 = np.sin(np.radians(lat)) ** 2
    want = np.cos(np.radians(lat)) * (1 - e2 * s2) / (1 - e2)
    ratio = np.linalg.norm(ve) / np.linalg.norm(vn)
    assert abs(ratio / want - 1.0) < 1e-3
    cosang = abs(ve @ vn) / (np.linalg.norm(ve) * np.linalg.norm(vn))
    assert cosang < 1e-3  # perpendicular
