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


def test_conic_inverse_roundtrip():
    """VERDICT r3 #4: LCC / Albers inverses recover lat/lon to double
    precision across each parameterization's service area."""
    from rsgislib_ray.functions.conic import (
        ALBERS_CONUS,
        LCC_FR,
        albers_forward,
        albers_inverse,
        lcc_forward,
        lcc_inverse,
    )

    rng = np.random.default_rng(7)
    lat = rng.uniform(42.0, 51.0, 500)
    lon = rng.uniform(-5.0, 9.0, 500)
    la, lo = lcc_inverse(*lcc_forward(lat, lon, LCC_FR), LCC_FR)
    assert np.abs(la - lat).max() < 1e-11
    assert np.abs(lo - lon).max() < 1e-11
    lat = rng.uniform(24.0, 49.0, 500)
    lon = rng.uniform(-125.0, -66.0, 500)
    la, lo = albers_inverse(*albers_forward(lat, lon, ALBERS_CONUS),
                            ALBERS_CONUS)
    assert np.abs(la - lat).max() < 1e-11
    assert np.abs(lo - lon).max() < 1e-11


def test_tmerc_roundtrip_and_utm_consistency():
    """The generalized transverse Mercator: (a) round-trips to the
    Krueger-series truncation level near the central meridian, and
    (b) with UTM zone-30 constants reproduces utm_from_latlon exactly."""
    from rsgislib_ray.functions.utm import (
        TMERC_GB,
        tmerc_constants,
        tmerc_forward,
        tmerc_inverse,
        utm_from_latlon,
    )

    rng = np.random.default_rng(11)
    lat = rng.uniform(50.0, 59.0, 500)
    lon = rng.uniform(-4.0, 0.0, 500)  # within 2 deg of the 2W meridian
    e, n = tmerc_forward(lat, lon, TMERC_GB)
    la, lo = tmerc_inverse(e, n, TMERC_GB)
    # Krueger series truncation: ~3e-7 deg (~3 cm) at 2 deg from the
    # central meridian — identical to the UTM pair's own series error
    assert np.abs(la - lat).max() < 1e-6
    assert np.abs(lo - lon).max() < 1e-6
    # UTM zone 30 (central meridian 3W, k0=0.9996, fe=500km, fn=0)
    z30 = tmerc_constants(0.0, -3.0, 0.9996, 500000.0, 0.0)
    lon = rng.uniform(-5.9, -0.1, 500)
    eg, ng = tmerc_forward(lat, lon, z30)
    eu, nu, zn, _ = utm_from_latlon(lat, lon)
    assert (zn == 30).all()
    assert np.array_equal(eg, eu)
    assert np.array_equal(ng, nu)
